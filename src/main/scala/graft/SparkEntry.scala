package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2b): each entry is a
  * `(SparkSession, sfDir) => DataFrame` built from Spark primitives, and
  * (where ANSI-SQL-expressible) `oracleSql` carries the DuckDB twin the
  * driver hash-compares against. Column names and ordering are aligned on
  * both sides; see `graft.ops` package doc for the cross-engine
  * determinism rules.
  */
object SparkEntry {

  /** Flagship: the reference's own capability — feature derivation
    * (24 one-hot hours, 7 one-hot dows, duration, JFK flag) over the
    * reference's ingest output. Falls back to the three-way join on
    * sf0.001 if the reference parquet is unavailable. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val ref = "/root/reference/01.parquet"
    if (new java.io.File(ref).exists())
      graft.features.Features(spark.read.parquet(ref))
    else
      Joins.threeWay(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregations
    "agg_pricing_summary" -> (Aggregations.pricingSummary _),
    "agg_count_distinct"  -> (Aggregations.countDistinct_ _),
    "agg_stats_minmax"    -> (Aggregations.statsMinMax _),
    "agg_rollup"          -> (Aggregations.rollup_ _),
    "agg_cube"            -> (Aggregations.cube_ _),
    "agg_monthly_orders"  -> (Aggregations.monthlyOrders _),
    "agg_grouping_sets"   -> (Aggregations.groupingSets_ _),
    "agg_salted_skew"     -> (Skew.saltedHotKeyAgg _),
    "join_salted_skew"    -> (Skew.saltedSkewJoin _),
    "agg_approx_distinct" -> (Aggregations.approxDistinct _),
    "agg_approx_quantiles" -> (Aggregations.approxQuantiles _),
    "agg_custom_udaf"     -> (CustomAgg.weightedAvgDiscount _),
    // Projections / filters
    "filter_predicates"     -> (Filters.predicates _),
    "filter_null_semantics" -> (Filters.nullSemantics _),
    "filter_projection"     -> (Filters.projection _),
    // Joins
    "join_inner_customer_orders" -> (Joins.innerCustomerOrders _),
    "join_broadcast_dims"        -> (Joins.broadcastDims _),
    "join_left_outer"            -> (Joins.leftOuter _),
    "join_semi"                  -> (Joins.semi _),
    "join_anti"                  -> (Joins.anti _),
    "join_range_band"            -> (Joins.rangeBand _),
    "join_three_way"             -> (Joins.threeWay _),
    "join_bucketed_colocated"    -> (Joins.bucketedColocated _),
    "join_asof"                  -> (AdvancedJoins.asofPurchaseView _),
    "agg_pivot"                  -> (AdvancedJoins.pivotStatusPriority _),
    "agg_percentiles"            -> (AdvancedJoins.percentiles _),
    "text_top_tokens"            -> (AdvancedJoins.topTokens _),
    // Windows
    "window_topk_per_group" -> (Windows.topkPerGroup _),
    "window_topk_native"    -> ((s, d) => {
      graft.functions.GraftFunctions.register(s); Windows.topkPerGroupNative(s, d)
    }),
    "window_lag_lead"       -> (Windows.lagLead _),
    "window_running_sum"    -> (Windows.runningSum _),
    "window_rank_dense"     -> (Windows.rankDense _),
    "window_distribution"   -> (Windows.distribution _),
    "window_range_frame"    -> (Windows.rangeFrame _),
    "window_time_range_frame" -> (Windows.timeRangeFrame _),
    "window_first_last_nth" -> (Windows.firstLastNth _),
    // Sorts / limits / top-k
    "sort_topk"             -> (SortsLimits.topK _),
    "sort_multi_col"        -> (SortsLimits.multiColSort _),
    "sort_filtered_bottomk" -> (SortsLimits.filteredBottomK _),
    "sort_global_ranged" -> (SortsLimits.globalRangedSort _),
    // Set ops
    "setop_union_all"      -> (SetOps.unionAll _),
    "setop_intersect"      -> (SetOps.intersect_ _),
    "setop_except"         -> (SetOps.except_ _),
    "setop_union_distinct" -> (SetOps.unionDistinct _),
    "setop_except_all"     -> (SetOps.exceptAll_ _),
    "setop_intersect_all"  -> (SetOps.intersectAll_ _),
    "agg_corr_stddev"      -> (Statistics.corrStddev _),
    // Scalar functions
    "scalar_string"      -> (Scalars.stringFuncs _),
    "scalar_math"        -> (Scalars.mathFuncs _),
    "scalar_datetime"    -> (Scalars.datetimeFuncs _),
    "scalar_conditional" -> (Scalars.conditionalFuncs _),
    "scalar_json"        -> (Scalars.jsonFuncs _),
    "scalar_array"       -> (Scalars.arrayFuncs _),
    "scalar_struct_map"  -> (Scalars.structMapFuncs _),
    "scalar_bitwise"     -> (Scalars.bitwiseFuncs _),
    // Composite TPC-H shapes
    "tpch_q3_shipping_priority" -> (TpchShapes.q3ShippingPriority _),
    "tpch_q5_local_supplier"    -> (TpchShapes.q5LocalSupplierVolume _),
    "multimodal_joined_pipeline" -> (TpchShapes.multimodalJoinedPipeline _),
    // Dedup (north-star)
    "dedup_exact"         -> (Dedup.exact _),
    "dedup_exact_normalized" -> (Dedup.exactNormalized _),
    "dedup_keep_first"    -> (Dedup.keepFirst _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_minhash_lsh"   -> (Dedup.minhashLsh _),
    "dedup_simhash"       -> (Dedup.simhash _),
    "dedup_connected_components" -> (Dedup.connectedComponents _),
    "dedup_apply"         -> (Dedup.dedupApply _),
    "graph_pagerank_bipartite" -> (Graph.pagerankBipartite _),
    // Similarity search (north-star)
    "sim_cosine_topk"       -> (Similarity.cosineTopK _),
    "sim_embedding_neardup" -> (Similarity.embeddingNearDup _),
    "sim_ann_lsh_bucketed"  -> (Similarity.annLshBucketed _),
    "sim_ann_ivf"           -> (Similarity.annIvf _),
    // Text analysis (north-star)
    "text_token_stats"   -> (TextAnalysis.tokenStats _),
    "text_quality_score" -> (TextAnalysis.qualityScore _),
    "text_language_id"   -> (TextAnalysis.languageId _),
    "text_fingerprint"   -> (TextAnalysis.fingerprint _),
    "text_lang_profile"  -> (TextAnalysis.langProfile _),
    "text_topk_sketch"   -> (TextAnalysis.topkSketch _),
    // Multimodal columns (north-star; decode is a documented stub)
    "multimodal_decode_stats" -> (graft.multimodal.Multimodal.decodeStats _),
    "multimodal_frame_sample" -> (graft.multimodal.Multimodal.frameSample _),
    "multimodal_image_decode" -> (graft.multimodal.Multimodal.imageDecode _),
    "multimodal_audio_decode" -> (graft.multimodal.Multimodal.audioDecode _),
    "multimodal_phash_dedup" -> (graft.multimodal.Multimodal.phashDedup _),
    // Streaming shapes (batch twins of the Structured Streaming plans)
    "stream_tumbling_daily" -> (graft.streaming.StreamingOps.tumblingDaily _),
    "stream_topk_windowed"  -> (graft.streaming.StreamingOps.topkWindowed _),
    "stream_sliding_window" -> (graft.streaming.StreamingOps.slidingWindow _),
    "stream_session_window" -> (graft.streaming.StreamingOps.sessionWindow _),
    "stream_dedup"          -> (graft.streaming.StreamingOps.streamDedup _),
    "stream_sessionize"     -> (graft.streaming.Sessionize.sessionsBatch _),
    // Training-data pipeline ops (north-star)
    "pipe_hash_split"       -> (Pipeline.hashSplit _),
    "pipe_pack_sequences"   -> (Pipeline.packSequences _),
    "pipe_normalize_stats"  -> (Pipeline.normalizeStats _),
    "pipe_repetition_score" -> (Pipeline.repetitionScore _),
    "pipe_contamination"    -> (Pipeline.contamination _),
    "pipe_quality_funnel"   -> (Pipeline.qualityFunnel _),
    "pipe_mixture_sample"   -> (Pipeline.mixtureSample _),
    "pipe_length_buckets"   -> (Pipeline.lengthBuckets _),
    "pipe_stratified_sample" -> (Pipeline.stratifiedSample _),
    "pipe_quality_constraints" -> (Pipeline.qualityConstraints _),
    // Round 5: histogram agg, binned interval join, CSV/JSON round-trips
    "agg_histogram"          -> (Aggregations.histogram _),
    "join_interval_binned"   -> (AdvancedJoins.priorEventsWindow _),
    "source_csv_roundtrip"   -> (Sources.csvRoundtrip _),
    "source_json_roundtrip"  -> (Sources.jsonRoundtrip _),
    "source_partitioned_pruned" -> (Sources.partitionedPruned _),
    "source_orc_roundtrip"   -> (Sources.orcRoundtrip _),
    "source_text_lines"      -> (Sources.textLinesRoundtrip _),
    "join_dpp_pruned"        -> (Sources.dppPrunedJoin _),
    // Lakehouse maintenance
    "merge_upsert"        -> (Lakehouse.mergeUpsert _),
    "merge_scd2"          -> (Lakehouse.scd2UserStatus _),
    "cluster_zorder_bins" -> (Lakehouse.zorderBins _),
    "join_bloom_prefilter" -> (RuntimeFilter.bloomPrefilteredJoin _),
    "events_retention_cohorts" -> (AdvancedJoins.retentionCohorts _),
    "events_funnel_ordered"  -> (AdvancedJoins.eventsFunnel _),
    "text_regex_tokens"      -> (TextAnalysis.regexTokens _),
    "text_bigram_lm_score"   -> (TextAnalysis.bigramLmScore _),
    "text_pii_redact"        -> (TextAnalysis.piiRedact _),
    "text_char_trigrams"     -> (TextAnalysis.charTrigrams _),
    "pipe_dedup_filter_split" -> (Pipeline.dedupFilterSplit _),
    "multimodal_resize_plan"  -> (graft.multimodal.Multimodal.resizePlan _),
  )

  def oracleSql: Map[String, String] = Map(
    "agg_pricing_summary" -> Aggregations.pricingSummarySql,
    "agg_count_distinct"  -> Aggregations.countDistinctSql,
    "agg_stats_minmax"    -> Aggregations.statsMinMaxSql,
    "agg_rollup"          -> Aggregations.rollupSql,
    "agg_cube"            -> Aggregations.cubeSql,
    "agg_monthly_orders"  -> Aggregations.monthlyOrdersSql,
    "agg_grouping_sets"   -> Aggregations.groupingSetsSql,
    "agg_salted_skew"     -> Skew.saltedHotKeyAggSql,
    "join_salted_skew"    -> Skew.saltedSkewJoinSql,
    "agg_custom_udaf"     -> CustomAgg.weightedAvgDiscountSql,
    "filter_predicates"     -> Filters.predicatesSql,
    "filter_null_semantics" -> Filters.nullSemanticsSql,
    "filter_projection"     -> Filters.projectionSql,
    // Sketch queries emit exact values + deterministic within-tolerance
    // booleans, so the sketch path is oracle-checkable despite
    // engine-specific internals.
    "agg_approx_distinct"  -> Aggregations.approxDistinctSql,
    "agg_approx_quantiles" -> Aggregations.approxQuantilesSql,
    "join_inner_customer_orders" -> Joins.innerCustomerOrdersSql,
    "join_broadcast_dims"        -> Joins.broadcastDimsSql,
    "join_left_outer"            -> Joins.leftOuterSql,
    "join_semi"                  -> Joins.semiSql,
    "join_anti"                  -> Joins.antiSql,
    "join_range_band"            -> Joins.rangeBandSql,
    "join_three_way"             -> Joins.threeWaySql,
    "join_bucketed_colocated"    -> Joins.bucketedColocatedSql,
    "join_asof"                  -> AdvancedJoins.asofPurchaseViewSql,
    "agg_pivot"                  -> AdvancedJoins.pivotStatusPrioritySql,
    "agg_percentiles"            -> AdvancedJoins.percentilesSql,
    "text_top_tokens"            -> AdvancedJoins.topTokensSql,
    "window_topk_per_group" -> Windows.topkPerGroupSql,
    "window_topk_native"    -> Windows.topkPerGroupNativeSql,
    "window_lag_lead"       -> Windows.lagLeadSql,
    "window_running_sum"    -> Windows.runningSumSql,
    "window_rank_dense"     -> Windows.rankDenseSql,
    "window_distribution"   -> Windows.distributionSql,
    "window_range_frame"    -> Windows.rangeFrameSql,
    "window_time_range_frame" -> Windows.timeRangeFrameSql,
    "window_first_last_nth" -> Windows.firstLastNthSql,
    "sort_topk"             -> SortsLimits.topKSql,
    "sort_multi_col"        -> SortsLimits.multiColSortSql,
    "sort_filtered_bottomk" -> SortsLimits.filteredBottomKSql,
    "sort_global_ranged" -> SortsLimits.globalRangedSortSql,
    "setop_union_all"      -> SetOps.unionAllSql,
    "setop_intersect"      -> SetOps.intersectSql,
    "setop_except"         -> SetOps.exceptSql,
    "setop_union_distinct" -> SetOps.unionDistinctSql,
    "setop_except_all"     -> SetOps.exceptAllSql,
    "setop_intersect_all"  -> SetOps.intersectAllSql,
    "agg_corr_stddev"      -> Statistics.corrStddevSql,
    "scalar_string"      -> Scalars.stringFuncsSql,
    "scalar_math"        -> Scalars.mathFuncsSql,
    "scalar_datetime"    -> Scalars.datetimeFuncsSql,
    "scalar_conditional" -> Scalars.conditionalFuncsSql,
    "scalar_json"        -> Scalars.jsonFuncsSql,
    "scalar_array"       -> Scalars.arrayFuncsSql,
    "scalar_struct_map"  -> Scalars.structMapFuncsSql,
    "scalar_bitwise"     -> Scalars.bitwiseFuncsSql,
    "tpch_q3_shipping_priority" -> TpchShapes.q3ShippingPrioritySql,
    "tpch_q5_local_supplier"    -> TpchShapes.q5LocalSupplierVolumeSql,
    "multimodal_joined_pipeline" -> TpchShapes.multimodalJoinedPipelineSql,
    "dedup_exact"         -> Dedup.exactSql,
    "dedup_exact_normalized" -> Dedup.exactNormalizedSql,
    "dedup_keep_first"    -> Dedup.keepFirstSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    // LSH tiers output exact-Jaccard-verified pairs (threshold 0.8), so
    // both hash-check against the ground-truth near-dup oracle even though
    // the candidate sketches are engine-specific.
    "dedup_minhash_lsh"   -> Dedup.minhashLshSql,
    "dedup_simhash"       -> Dedup.simhashSql,
    "dedup_connected_components" -> Dedup.connectedComponentsSql,
    "dedup_apply"         -> Dedup.dedupApplySql,
    "graph_pagerank_bipartite" -> Graph.pagerankBipartiteSql,
    "sim_cosine_topk"       -> Similarity.cosineTopKSql,
    "sim_embedding_neardup" -> Similarity.embeddingNearDupSql,
    "sim_ann_lsh_bucketed"  -> Similarity.annLshBucketedSql,
    "sim_ann_ivf"           -> Similarity.annIvfSql,
    "text_token_stats"   -> TextAnalysis.tokenStatsSql,
    "text_quality_score" -> TextAnalysis.qualityScoreSql,
    "text_language_id"   -> TextAnalysis.languageIdSql,
    "text_fingerprint"   -> TextAnalysis.fingerprintSql,
    "text_lang_profile"  -> TextAnalysis.langProfileSql,
    "text_topk_sketch"   -> TextAnalysis.topkSketchSql,
    "multimodal_decode_stats" -> graft.multimodal.Multimodal.decodeStatsSql,
    "multimodal_frame_sample" -> graft.multimodal.Multimodal.frameSampleSql,
    "multimodal_image_decode" -> graft.multimodal.Multimodal.imageDecodeSql,
    "multimodal_audio_decode" -> graft.multimodal.Multimodal.audioDecodeSql,
    "multimodal_phash_dedup" -> graft.multimodal.Multimodal.phashDedupSql,
    "stream_tumbling_daily" -> graft.streaming.StreamingOps.tumblingDailySql,
    "stream_topk_windowed"  -> graft.streaming.StreamingOps.topkWindowedSql,
    "stream_sliding_window" -> graft.streaming.StreamingOps.slidingWindowSql,
    "stream_session_window" -> graft.streaming.StreamingOps.sessionWindowSql,
    "stream_dedup"          -> graft.streaming.StreamingOps.streamDedupSql,
    "stream_sessionize"     -> graft.streaming.Sessionize.sessionsBatchSql,
    "pipe_hash_split"       -> Pipeline.hashSplitSql,
    "pipe_pack_sequences"   -> Pipeline.packSequencesSql,
    "pipe_normalize_stats"  -> Pipeline.normalizeStatsSql,
    "pipe_repetition_score" -> Pipeline.repetitionScoreSql,
    "pipe_contamination"    -> Pipeline.contaminationSql,
    "pipe_quality_funnel"   -> Pipeline.qualityFunnelSql,
    "pipe_mixture_sample"   -> Pipeline.mixtureSampleSql,
    "pipe_length_buckets"   -> Pipeline.lengthBucketsSql,
    "pipe_stratified_sample" -> Pipeline.stratifiedSampleSql,
    "pipe_quality_constraints" -> Pipeline.qualityConstraintsSql,
    "agg_histogram"          -> Aggregations.histogramSql,
    "join_interval_binned"   -> AdvancedJoins.priorEventsWindowSql,
    "source_csv_roundtrip"   -> Sources.csvRoundtripSql,
    "source_json_roundtrip"  -> Sources.jsonRoundtripSql,
    "source_partitioned_pruned" -> Sources.partitionedPrunedSql,
    "source_orc_roundtrip"   -> Sources.orcRoundtripSql,
    "source_text_lines"      -> Sources.textLinesRoundtripSql,
    "join_dpp_pruned"        -> Sources.dppPrunedJoinSql,
    "merge_upsert"        -> Lakehouse.mergeUpsertSql,
    "merge_scd2"          -> Lakehouse.scd2UserStatusSql,
    "cluster_zorder_bins" -> Lakehouse.zorderBinsSql,
    "join_bloom_prefilter" -> RuntimeFilter.bloomPrefilteredJoinSql,
    "events_retention_cohorts" -> AdvancedJoins.retentionCohortsSql,
    "events_funnel_ordered"  -> AdvancedJoins.eventsFunnelSql,
    "text_regex_tokens"      -> TextAnalysis.regexTokensSql,
    "text_bigram_lm_score"   -> TextAnalysis.bigramLmScoreSql,
    "text_pii_redact"        -> TextAnalysis.piiRedactSql,
    "text_char_trigrams"     -> TextAnalysis.charTrigramsSql,
    "pipe_dedup_filter_split" -> Pipeline.dedupFilterSplitSql,
    "multimodal_resize_plan"  -> graft.multimodal.Multimodal.resizePlanSql,
  )
}
