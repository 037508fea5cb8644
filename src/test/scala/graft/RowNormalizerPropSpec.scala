package graft

import graft.ingest.Ingest
import graft.schema.GreenTaxi
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the S4 row normalizer (SURVEY.md §5): for any line
  * with ≥20 comma-separated fields, the regex keeps exactly the first 20;
  * for any line with <20 it matches nothing. */
object RowNormalizerPropSpec extends Properties("RowNormalizer") {

  private val re = Ingest.RowRegex.r
  private val field: Gen[String] =
    Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-', ':')))

  property("lines with >= 20 fields keep exactly the first 20") =
    Prop.forAll(Gen.chooseNum(GreenTaxi.NumColumns, 30).flatMap(n =>
      Gen.listOfN(n, field))) { fields =>
      val line = fields.mkString(",")
      re.findFirstMatchIn(line) match {
        case Some(m) =>
          val kept = m.group(1).split(",", -1)
          kept.length == GreenTaxi.NumColumns &&
            kept.toSeq == fields.take(GreenTaxi.NumColumns)
        case None => false
      }
    }

  property("lines with < 20 fields do not match") =
    Prop.forAll(Gen.chooseNum(1, GreenTaxi.NumColumns - 1).flatMap(n =>
      Gen.listOfN(n, field))) { fields =>
      re.findFirstMatchIn(fields.mkString(",")).isEmpty
    }
}
