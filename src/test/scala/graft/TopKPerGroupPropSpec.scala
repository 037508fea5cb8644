package graft

import graft.plans.GraftOps
import org.scalacheck.{Gen, Prop, Properties}

/** Randomized equivalence: the custom TopKPerGroup operator must agree
  * with a reference implementation (sort + take per group) on arbitrary
  * data, group counts, and k — including k ≥ group size, single-row
  * groups, and duplicate order-values disambiguated by a tiebreaker. */
class TopKPerGroupPropSpec extends Properties("TopKPerGroup") {
  private lazy val spark = TestSpark.spark

  private val rowsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 300)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0L, 8L)
      v <- Gen.chooseNum(-50L, 50L)
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }

  property("matches per-group sort+take for random data and k") =
    Prop.forAll(rowsGen, Gen.chooseNum(1, 12)) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("g", "v", "id")
      val got = GraftOps.topKPerGroup(
          df, Seq("g"), Seq("v" -> true, "id" -> false), k)
        .as[(Long, Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).valuesIterator.flatMap { grp =>
        grp.sortBy { case (_, v, id) => (-v, id) }.take(k)
      }.toSet
      got == expected
    }
}
