package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the LSH recall/cost sweep: the p-plane bucket is a
  * PREFIX of the (p+2)-plane bucket, so refining planes can only shrink
  * both the candidate sets and the hit counts — the sweep must be
  * monotone, and the fixed-point recall must re-derive from its own
  * integer columns. */
class AnnRecallEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("sweep is monotone in plane count and arithmetically consistent") {
    import spark.implicits._
    val rows = Similarity.annRecallEval(spark, dir)
      .select("n_planes", "n_exact", "n_hits", "recall_fp", "n_cand_pairs")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(4, 6, 8))
    rows.foreach { case (p, ne, nh, fp, nc) =>
      assert(ne === 50L, s"p=$p: 10 benchmark queries x top-5 expected")
      assert(nh >= 0 && nh <= ne)
      assert(fp === nh * 1000000L / ne, s"p=$p: recall_fp mismatch")
      assert(nc >= 0)
    }
    // bucket(p+2) equality implies bucket(p) equality (low-bit prefix):
    // candidates and therefore hits can only shrink as p grows.
    rows.sliding(2).foreach { case Array(coarse, fine) =>
      assert(fine._5 <= coarse._5,
        s"candidates grew when refining ${coarse._1}->${fine._1} planes")
      assert(fine._3 <= coarse._3,
        s"hits grew when refining ${coarse._1}->${fine._1} planes")
    }
  }
}
