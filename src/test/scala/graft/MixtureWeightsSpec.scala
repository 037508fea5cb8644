package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the temperature-damped mixture weights: fixed-point
  * conservation and the damping direction (the whole point of α < 1). */
class MixtureWeightsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("weights conserve fixed-point mass and damp toward uniform") {
    import spark.implicits._
    val rows = Pipeline.mixtureWeights(spark, dir)
      .select("source", "lang", "n_docs", "raw_share_fp", "weight_fp")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.length > 1)
    // floor-division conservation: each share loses < 1 unit, so the sum
    // sits within n_domains of the 10^6 total on both scales
    for (tot <- Seq(rows.map(_._4).sum, rows.map(_._5).sum)) {
      assert(tot <= 1000000L && tot > 1000000L - rows.length,
        s"fixed-point mass $tot out of range for ${rows.length} domains")
    }
    // α=1/2 damping moves every share toward uniform: the largest domain
    // must lose share, the smallest must gain (strictly, unless already
    // uniform)
    val largest = rows.maxBy(_._3)
    val smallest = rows.minBy(_._3)
    if (largest._3 != smallest._3) {
      assert(largest._5 < largest._4,
        s"largest domain ${largest._1}/${largest._2} was not damped down")
      assert(smallest._5 > smallest._4,
        s"smallest domain ${smallest._1}/${smallest._2} was not damped up")
    }
    // the damped score re-derives from n_docs alone
    val sTot = rows.map(r =>
      math.floor(math.sqrt(r._3.toDouble) * 10000).toLong).sum
    rows.foreach { case (s, l, n, _, actual) =>
      val expected = math.floor(math.sqrt(n.toDouble) * 10000).toLong *
        1000000L / sTot
      assert(actual === expected, s"domain $s/$l weight mismatch")
    }
  }
}
