package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property-level agreement: star contraction must equal single-task
  * union-find on arbitrary graphs — many seeded shapes, not one example.
  * (Union-find is the trivially-auditable reference implementation; the
  * distributed algorithm is the one under test.) */
class StarContractionPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ccRun(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.select("doc_id", "canonical_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("star contraction equals union-find on 12 seeded random graphs") {
    import spark.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 20 + rnd.nextInt(180)
      val nEdges = rnd.nextInt(2 * nNodes)
      val edges = (0 until nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("d1", "d2")
        assert(ccRun(Dedup.starContractionCC(df.localCheckpoint())) ===
          ccRun(Dedup.unionFindCC(df)),
          s"disagreement on seed=$seed nodes=$nNodes edges=${edges.size}")
      }
    }
  }

  test("star contraction on pathological shapes: long chain, binary tree, two cliques") {
    import spark.implicits._
    // 200-chain (diameter 199), complete binary tree of 127 nodes,
    // two disjoint 15-cliques bridged by nothing
    val chain = (1L until 200L).map(i => (i, i + 1))
    val tree = (2L to 127L).map(i => (i / 2, i))
    val cliques = (for {
      base <- Seq(1000L, 2000L)
      i <- 0 until 15; j <- (i + 1) until 15
    } yield (base + i, base + j))
    for ((name, edges) <- Seq(("chain", chain), ("tree", tree), ("cliques", cliques))) {
      val df = edges.toDF("d1", "d2")
      assert(ccRun(Dedup.starContractionCC(df.localCheckpoint())) ===
        ccRun(Dedup.unionFindCC(df)), s"disagreement on $name")
    }
  }
}
