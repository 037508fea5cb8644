package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory-WIDE plan audit: no query may plan a cartesian/nested-loop
  * join unless it is either a deliberate exact-tier quadratic (named
  * below, each with a linear-scale sibling in the inventory) or a
  * constant-side join (1-row aggregate broadcast — scalar stats riding a
  * crossJoin). A new query that accidentally plans a data×data
  * nested-loop fails here before it ever reaches a scale where it
  * matters. Complements the per-query guards in PlanSpec/DedupGuardSpec
  * by covering every registered entry, including future ones, by
  * construction. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Deliberate quadratic ground-truth tiers (documented in SURVEY §9). */
  private val exactTiers = Set("sim_embedding_neardup")

  /** Queries whose nested-loop side is BOUNDED by construction — either
    * a 1-row/constant aggregate (scalar stats riding a crossJoin), a
    * literal lookup table, or a deliberately small broadcast panel. The
    * corpus side streams through ONE scan in every case; none is a
    * data×data cartesian.
    *  - 1-row corpus stats: bm25/tfidf/bigram_lm (N, total_len),
    *    pagerank (node count), pack_sequences (stratum totals), skyline
    *    (frontier table, ≪ points)
    *  - literal constant tables: range_band (5 bucket rows), lsh
    *    (hyperplane matrix)
    *  - bounded broadcast panels: cosine/mips top-k (query panel, ~2% of
    *    corpus, the documented exact tier), PQ ADC (k^M = 4096 code
    *    tuples — SURVEY §9's bounded-domain cross join), and the recall
    *    sweep (3-row plane-count table + the cosine query panel) */
  private val constantSideJoins = Set(
    "text_bm25_topk", "text_tfidf_topk", "graph_pagerank_bipartite",
    "pipe_pack_sequences", "text_bigram_lm_score", "skyline_pareto",
    "join_range_band", "sim_ann_lsh_bucketed", "sim_ann_pq_adc",
    "sim_cosine_topk", "sim_mips_topk", "sim_ann_recall_eval",
    "sim_ann_recall_sampled", // same impl as sim_ann_recall_eval (sampled truth)
    "dedup_banding_recall_sampled", // same impl as the full eval (doc slice)
    "pipe_mixture_weights", // 1-row domain-total scalar riding a crossJoin
    "pipe_k_anonymity", // 1-row corpus-totals scalar riding a crossJoin
    "sim_knn_graph_clusters", // 8-row hyperplane matrix broadcast (LSH sig pass)
    "dedup_banding_recall_eval", // 1-row recall x 1-row cost scalar crossJoins
    "agg_hll_intersection", // 1-row sketch x 1-row sketch per pair
    "text_bpe_apply", // 3 merge rounds, each a 1-row winning-pair broadcast
    // (bpe_pairs' identical crossJoins never reach its final plan: its
    // pair censuses are eagerly checkpointed, so the merges execute at
    // construction time)
    "pipe_dsir_weights", // 1-row vocab-total scalar riding a crossJoin
    "graph_modularity", // 1-row edge-count scalar riding a crossJoin
    "ts_cross_correlation", // 8-row literal lag table broadcast
    "text_collocations") // 1-row corpus-totals scalar riding a crossJoin

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no unintended cartesian or nested-loop join") {
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      if (!exactTiers.contains(name))
        assert(!p.contains("CartesianProduct"),
          s"$name plans a CartesianProduct — cap or re-key it:\n$p")
      if (!exactTiers.contains(name) && !constantSideJoins.contains(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — if the broadcast side " +
            s"is a 1-row aggregate, add it to constantSideJoins with a " +
            s"comment; otherwise re-key the join:\n$p")
      try spark.sharedState.cacheManager.clearCache()
      catch { case _: Throwable => () }
    }
  }
}
