package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the prefix-max skyline against the NAIVE quadratic dominance
  * anti-join, in-Spark, at test SF. This is the independence guarantee
  * the DuckDB twin carried until r16: the twin is now the windowed
  * dominance definition (the quadratic NOT EXISTS form timed out on
  * 2 M parts at sf100 — SCALE_r15 §4), so the O(n²)-vs-engine
  * cross-validation lives here, where n is test-sized by construction. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def naive(dir: String) = {
    val pts = graft.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val dominated = pts.as("a").join(pts.as("b"),
        col("b.p_retailprice") <= col("a.p_retailprice") &&
          col("b.p_size") >= col("a.p_size") &&
          (col("b.p_retailprice") < col("a.p_retailprice") ||
            col("b.p_size") > col("a.p_size")), "left_semi")
    pts.exceptAll(dominated)
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"prefix-max frontier equals the quadratic dominance anti-join ($dir)") {
      val fast = Skyline.paretoFrontier(spark, dir)
      assert(fast.exceptAll(naive(dir)).isEmpty &&
        naive(dir).exceptAll(fast).isEmpty,
        s"frontier mismatch vs naive dominance at $dir")
      assert(fast.count() > 0, "degenerate empty frontier")
    }
  }
}
