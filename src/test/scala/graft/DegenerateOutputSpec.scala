package graft.ops

import graft.{Liveness, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degenerate-output detector as a CI gate (promoted from the
  * SCALE_r11 dump-pass that caught bug five): every dedup / graph /
  * similarity query must produce a non-empty result whose liveness
  * columns carry actual signal at the correctness-gate SF. A capacity
  * cap that saturates (the SemDeDup-returns-0-dups class) empties these
  * columns while staying oracle-green, because the twins mirror the cap
  * — this suite makes that state a test FAILURE instead of a finding on
  * the next 10× scale run. The final test re-breaks a cap deliberately
  * and proves the detector fires. */
class DegenerateOutputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // the driver's correctness-gate SF: FIXTURES.md pins genuine near-dup /
  // graph / similarity signal in the data here, so "alive" is a property
  // of the generator, not luck
  private val dir = "/root/testdata/sf0.01"

  /** query → liveness columns (numeric "did it find anything" signals).
    * Empty list = non-empty result is evidence enough. */
  private val liveness: Seq[(String, Seq[String])] = Seq(
    // dedup tier
    "dedup_exact" -> Seq("n_dups"),
    "dedup_minhash_lsh" -> Seq("common"),
    "dedup_ngram_jaccard" -> Seq("common"),
    "dedup_simhash" -> Nil, // hamming ≤ 3 may legitimately be 0; rows are the signal
    "dedup_connected_components" -> Seq("cluster_size"),
    "dedup_semantic" -> Seq("dup_of"),
    "dedup_banding_recall_eval" -> Seq("n_truth", "n_recalled", "cand_pairs"),
    // graph tier (the co-occurrence cap emptied ALL of these at sf1 in r11)
    "graph_triangle_count" -> Seq("n_triangles"),
    "graph_label_propagation" -> Seq("community_size"),
    "graph_modularity" -> Seq("e_intra", "deg_sum"),
    "graph_kcore_peel" -> Seq("n_nodes", "n_edges"),
    "graph_assortativity" -> Seq("n_edges"),
    "graph_link_prediction" -> Seq("common_neighbors"),
    // similarity tier
    "sim_cosine_topk" -> Seq("cos_sim"),
    "sim_ann_lsh_bucketed" -> Seq("cos_sim"),
    "sim_ann_ivf" -> Seq("cos_sim"),
    "sim_ann_recall_eval" -> Seq("n_hits", "cost"),
    "sim_knn_graph_clusters" -> Seq("n_docs"))

  liveness.foreach { case (name, cols) =>
    test(s"$name output is alive at the gate SF") {
      Liveness.assertAlive(name, SparkEntry.queries(name)(spark, dir), cols)
    }
  }

  test("detector fires on a DELIBERATELY re-broken cluster cap (SemDeDup zero-dup class)") {
    // cap=1: every non-singleton cluster trips the hot-cluster guard, so
    // the operator silently deduplicates nothing — exactly the sf1 state
    // SCALE_r11 found, which stayed oracle-green. The detector must turn
    // that into a failure.
    val broken = Dedup.semanticWithCap(spark, dir, clusterCap = 1)
    val flags = Liveness.flags(broken, Seq("dup_of"))
    assert(flags == Seq("all-zero:dup_of"),
      s"re-broken cap must read degenerate, got: $flags")
  }

  test("detector fires on empty results and passes null-free live frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "n")
    assert(Liveness.flags(empty, Seq("n")) == Seq("empty"))
    val allZero = Seq((1L, 0L), (2L, 0L)).toDF("a", "n")
    assert(Liveness.flags(allZero, Seq("n")) == Seq("all-zero:n"))
    val live = Seq((1L, 0L), (2L, 3L)).toDF("a", "n")
    assert(Liveness.flags(live, Seq("n")).isEmpty)
  }
}
