package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-10 additions that a hash compare
  * can't articulate: LPA's community structure, the decomposition
  * identity, and DSIR's selection direction. */
class LpaStlDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("LPA labels are node ids and community sizes are consistent") {
    import spark.implicits._
    val rows = Graph.labelPropagation(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_._1).toSet
    // every label is a participating node's id (labels only ever copy ids)
    assert(rows.map(_._2).toSet.subsetOf(nodes))
    // community_size is exactly the label's multiplicity
    val sizes = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(rows.forall { case (_, lbl, sz) => sizes(lbl) == sz })
  }

  test("LPA result is invariant to partition count (determinism probe)") {
    val a = Graph.labelPropagation(spark, dir).collect().toSeq
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Graph.labelPropagation(spark, dir).collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("decomposition components reassemble the series within rounding") {
    import spark.implicits._
    val rows = TimeSeries.stlDecompose(spark, dir)
      .select(col("v"), col("trend"), col("seasonal"), col("remainder"))
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // v = trend + seasonal + remainder, each component rounded to 1e-6:
    // at most 2 rounding steps of error propagate into the identity
    assert(rows.forall { case (v, t, s, r) =>
      math.abs(v - (t + s + r)) <= 2e-6
    })
  }

  test("DSIR weights rank the target language above the rest on average") {
    import spark.implicits._
    val rows = Pipeline.dsirWeights(spark, dir)
      .select(col("lang"), col("per_token_fp"))
      .as[(String, Long)].collect()
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(String, Long)]) = xs.map(_._2).sum.toDouble / xs.length
    // the whole point of importance weighting: target-distribution docs
    // must score higher per token than the raw mixture
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} not above non-en mean ${mean(rest)}")
  }
}
