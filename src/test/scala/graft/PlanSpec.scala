package graft

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the physical properties the 100 TB design
  * depends on must survive refactors — filter/projection pushdown,
  * broadcast joins on dimensions, TakeOrderedAndProject for top-k, and
  * map-side partial aggregation. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filtered bottom-k: pushed filters + pruned scan + TakeOrderedAndProject") {
    val p = planString(SortsLimits.filteredBottomK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("PushedFilters: [IsNotNull(c_acctbal), LessThan(c_acctbal,0.0)]"))
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double>"))
  }

  test("dimension chain joins broadcast (no shuffle before aggregation)") {
    val p = planString(Joins.broadcastDims(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("pricing summary partial-aggregates before the exchange") {
    val p = planString(Aggregations.pricingSummary(spark, dir))
    assert(p.contains("partial_sum"))
    // scan reads only the 5 referenced columns of 11 (plan toString
    // truncates long ReadSchema strings, so match the scan column list)
    assert(p.contains(
      "FileScan parquet [l_quantity#"))
    assert(!p.contains("l_orderkey"), "pruned columns must not be scanned")
  }

  test("global top-k never global-sorts") {
    val df = SortsLimits.topK(spark, dir)
    val p = planString(df)
    assert(p.contains("TakeOrderedAndProject"))
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "top-k must not shuffle")
  }

  test("projection-only query prunes the orders scan to three columns") {
    val p = planString(Filters.projection(spark, dir))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double," +
      "o_orderpriority:string>"))
  }

  test("bigram LM model aggregate partial-aggregates before its exchange") {
    val p = planString(TextAnalysis.bigramLmScore(spark, dir))
    assert(p.contains("partial_count"),
      "the bigram frequency model must map-side combine before shuffling")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "both model and score passes must read the persisted bigram explode, not re-scan the corpus")
    org.apache.spark.sql.SparkSession.active.sharedState.cacheManager.clearCache()
  }

  test("partitioned read prunes to the filtered lang directories") {
    val out = java.nio.file.Files.createTempDirectory("planspec_part").toString
    Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val p = planString(Sources.prunedCensus(spark.read.parquet(out)))
    assert(p.contains("PartitionFilters: [lang#") && p.contains("IN (en,es"),
      s"the IN filter must prune directories via PartitionFilters:\n$p")
    assert(p.contains("DataFilters: []"),
      s"pruning must be directory-level only — no row-level data filter:\n$p")
  }

  test("DPP join prunes fact partitions with a runtime subquery") {
    // write the partitioned layout once, then assert the census plan
    // carries a dynamic-pruning subquery on the partitioned scan (the
    // partitions to read come from the runtime aggregate, not a static
    // filter) — and that executing it prunes the rare 'P' partition.
    val out = java.nio.file.Files.createTempDirectory("graft_dpp_spec").toString
    try {
      import org.apache.spark.sql.functions.{col, lit, when}
      graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
      val dim = graft.Tables.orders(spark, dir)
        .select(col("o_orderstatus")).distinct()
        .select(col("o_orderstatus"),
          when(col("o_orderstatus") === "F", lit("done"))
            .when(col("o_orderstatus") === "O", lit("open"))
            .otherwise(lit("pending")).as("status_class"))
        .write.mode("overwrite").parquet(s"$out-dim")
      val df = Sources.dppCensus(
        spark.read.parquet(out), spark.read.parquet(s"$out-dim"))
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruningexpression"),
        "partition filter must be a runtime DPP subquery")
      // dim filter drops status_class 'pending' → partition 'P' pruned
      val kept = df.collect().map(_.getString(0)).toSet
      assert(kept === Set("F", "O"), s"expected P pruned, got $kept")
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(new java.io.File(out)); del(new java.io.File(s"$out-dim"))
    }
  }

  test("scd2 runs both window passes over ONE hash exchange") {
    // change-filter (lag) and validity-range (lead) share the user_id
    // partitioning: Spark must not re-shuffle between them — at 100 TB a
    // second exchange would double the op's cost for nothing. The only
    // other exchange allowed is the final ORDER BY's range partitioning.
    val p = planString(Lakehouse.scd2UserStatus(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"scd2 must shuffle exactly once on user_id:\n$p")
  }

  test("time-range window uses a true RANGE frame over the interval") {
    // a ROWS frame under timestamp ties would be nondeterministic; the
    // optimized plan must carry a RangeFrame with the interval bound
    val p = Windows.timeRangeFrame(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("specifiedwindowframe(RangeFrame"),
      "trailing-hour frame must be value-based (RANGE), not ROWS")
    assert(p.contains("HOUR"), "frame bound must be the hour interval")
  }

  test("global ranged sort: RangePartitioning exchange, no single-partition data sort") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.SortExec
    val df = SortsLimits.globalRangedSort(spark, dir)
    // unwrap the AQE root: collect() does not traverse into
    // AdaptiveSparkPlanExec's inner plan before execution
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val rangeExchanges = plan.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(rangeExchanges.nonEmpty, "the sorted layout must come from a range exchange")
    assert(rangeExchanges.forall(_.outputPartitioning.numPartitions > 1),
      "range exchange must spread over many partitions, not funnel into one")
    // every sort over the fact data is within-partition (global=false);
    // the only global sort allowed is the final ORDER BY on the tiny
    // per-month manifest (after the aggregation)
    val dataSorts = plan.collect {
      case s: SortExec if s.global &&
        s.output.exists(_.name == "l_orderkey") => s
    }
    assert(dataSorts.isEmpty, "fact rows must never be globally sorted on one node")
  }

  test("OHLC resample: both window passes and the census share ONE hash exchange") {
    // rna (asc) and rnd (desc) windows and the bar aggregate all key on
    // (event_type, bar) — the plan must carry one Exchange; a re-shuffle
    // between the sorts or before the aggregate would triple the op's
    // shuffle volume at 100 TB. The only other exchange is the final
    // ORDER BY's range partitioning.
    val p = planString(TimeSeries.ohlcResample(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"ohlc must shuffle exactly once on (event_type, bar):\n$p")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "row_number windows must be present")
  }

  test("TF-IDF: df table broadcasts and rank filter plans as WindowGroupLimit") {
    val p = planString(TextAnalysis.tfidfTopTerms(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      "token df table must broadcast, never shuffle the tf table again")
    assert(p.contains("WindowGroupLimit"),
      "per-doc top-3 must keep 3 rows per group before the window shuffle")
  }

  test("attribution interval join executes as equi-join, not nested loop") {
    val plan = AdvancedJoins.attributionPairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned attribution join must be a hash equi-join:\n$plan")
  }

  test("PQ ADC: corpus joins its codes by hash, never a per-vector cartesian") {
    // the only cross join allowed is queries × distinct code tuples
    // (bounded by k^M); the corpus side must come back via an equi-join
    // on the code columns
    val plan = ops.Similarity.annPqAdc(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus codes must equi-join the bounded score table:\n$plan")
    val corpusCartesian = plan.contains("CartesianProduct")
    assert(!corpusCartesian, s"no cartesian may touch the corpus:\n$plan")
  }

  test("ann index upsert: narrow frozen-cell assignment, join-free census fold") {
    // The upsert is batch-sized work: cell assignment must be a narrow
    // projection against the broadcast quantizer (no join, no cartesian
    // anywhere), and the directory/base/batch censuses must assemble via
    // the union fold (no join operator at all in the plan).
    val plan = planString(ops.Similarity.annIndexUpsert(spark, dir))
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"upsert must stay join-free (union-fold assembly):\n$plan")
    assert(plan.contains("Union"), s"expected the union census fold:\n$plan")
  }

  test("triangle count: every join is an equi-join, never a cartesian") {
    val plan = ops.Graph.triangleCount(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"triangle joins must stay equi-joins:\n$plan")
    org.apache.spark.sql.SparkSession.active.sharedState.cacheManager.clearCache()
  }

  test("BM25: term filter reaches the exploded scan side; df and stats broadcast") {
    val df = TextAnalysis.bm25TopK(spark, dir)
    val p = planString(df)
    // top-20 must come from TakeOrderedAndProject (no global sort) and
    // both the vocabulary-sized df table and the 1-row stats table must
    // ride broadcasts — the corpus shuffles only for the tf aggregate
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 3,
      s"bm25 should shuffle for tf/df aggregation only, got ${shuffles.size}:\n$p")
  }

  test("pattern match: ONE exchange carries the per-user sequence build") {
    val df = Sequence.patternMatch(spark, dir)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // collect_list agg + final orderBy = 1 hash + 1 range exchange
    assert(shuffles.size <= 2,
      s"pattern match must shuffle once on user_id (plus output sort), got ${shuffles.size}")
  }

  test("time-to-kth-type: both stacked windows share ONE hash exchange") {
    // repartition(user_id) satisfies both the (user,type) and (user)
    // window clustering — a second hash exchange means the subset-key
    // reuse broke
    val p = planString(Windows.timeToKthType(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected one hash exchange for both windows:\n$p")
  }

  test("BFS rounds: shuffle-hash expansion, distance table as build side, no sort") {
    // r15 shape: the node-sized distance table must never broadcast (a
    // per-round broadcast costs a driver job that re-runs every prior
    // round's chain) and the edge side must never SORT (SMJ would re-sort
    // the edge set each round) — shuffled hash join with the tiny
    // distance table built per round is the 100 TB posture and the
    // local one-job plan.
    val df = ops.Graph.bfsDistances(spark, dir)
    val p = planString(df)
    assert(p.contains("ShuffledHashJoin"),
      s"BFS expansion must be a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"),
      s"BFS expansion must not broadcast or sort the per-round tables:\n$p")
    org.apache.spark.sql.SparkSession.active.sharedState.cacheManager.clearCache()
  }

  test("pagerank rounds: shuffle-hash rank join, no per-round rank broadcast") {
    // r17 adoption (BENCH_NOTES): each round's broadcast(rank) build job
    // re-executed the prior rounds' chain — the BFS r15 defect one tier
    // up. The rank join must be a shuffled hash join (node-sized rank
    // exchange per round, persisted edge frame's exchange reused) and
    // must never sort; the ONE allowed broadcast is the degree/node
    // table onto the edge scan (deg is joined once, outside the rounds).
    val df = ops.Graph.pagerankBipartite(spark, dir)
    val p = planString(df)
    assert(p.contains("ShuffledHashJoin"),
      s"pagerank round join must be a shuffled hash join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"pagerank rounds must not sort or cross:\n$p")
    // constant-count broadcasts (deg onto edges + the n/r0 scalars) are
    // allowed; the regression this pins is ROUND-count-proportional
    // broadcasts (3 rounds would add 3 more)
    assert("BroadcastHashJoin".r.findAllIn(p).length <= 3,
      s"per-round rank broadcasts crept back into the pagerank plan:\n$p")
    org.apache.spark.sql.SparkSession.active.sharedState.cacheManager.clearCache()
  }

  test("weighted sample and domain quota aggregate map-side (no pre-shuffle explode)") {
    val pw = planString(Pipeline.weightedSample(spark, dir))
    assert(pw.contains("partial_count"), "weighted sample must partial-aggregate")
    val pq = planString(Pipeline.domainQuota(spark, dir))
    // quota ranking is a per-domain window; the census then groups on the
    // SAME key, so the aggregate must not re-shuffle after the window
    val quotaShuffles = Pipeline.domainQuota(spark, dir)
      .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    assert(quotaShuffles.size <= 2,
      s"domain quota: window + output sort only, got ${quotaShuffles.size}:\n$pq")
  }
}
