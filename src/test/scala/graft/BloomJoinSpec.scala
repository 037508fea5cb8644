package graft

import graft.functions.BloomOps
import graft.ops.RuntimeFilter
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom runtime-filter guards: the sketch must never produce a false
  * NEGATIVE (that would change join results), its false-positive rate
  * must stay small at the pinned parameters, and the probe filter must
  * physically sit under the fact side's exchange — pruning before the
  * shuffle is the entire point of the pattern. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloomBitsFor scales with the dim key count — a fixed 2^17 saturates to a no-op filter") {
    // floor regime: small dims keep the 16 KiB sketch
    assert(RuntimeFilter.bloomBitsFor(0) === RuntimeFilter.BloomBitsFloor)
    assert(RuntimeFilter.bloomBitsFor(13000) === RuntimeFilter.BloomBitsFloor)
    // linear regime: ~10 bits/key, word-aligned
    assert(RuntimeFilter.bloomBitsFor(100000) === 1000000)
    assert(RuntimeFilter.bloomBitsFor(100001) % 64 === 0)
    assert(RuntimeFilter.bloomBitsFor(1000000) === 10000000)
    // cap regime: broadcastability fence at 2^27
    assert(RuntimeFilter.bloomBitsFor(1L << 40) === (1 << 27))
  }

  test("BloomOps: no false negatives; FPR below 1% at 2^17 bits / 10k keys") {
    val bits = RuntimeFilter.bloomBitsFor(10000)
    val words = new Array[Long](bits / 64)
    val keys = (0 until 10000).map(i => i * 7919L + 13)
    keys.foreach(k => BloomOps.set(words, bits, k))
    val bytes = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.asLongBuffer().put(words)
    val bf = bytes.array()
    assert(keys.forall(BloomOps.mightContain(bf, _)), "false negative!")
    val probes = (0 until 100000).map(i => -1L - i * 104729L)
    val fp = probes.count(BloomOps.mightContain(bf, _))
    // theory at m=131072, n=10000, k=4: (1-e^{-kn/m})^4 ≈ 0.45% — allow 2×
    assert(fp.toDouble / probes.size < 0.01, s"FPR too high: $fp/100000")
  }

  test("bloom-prefiltered join ≡ the plain exact join") {
    val got = RuntimeFilter.bloomPrefilteredJoin(spark, dir)
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir)
        .filter(col("p_brand").isin(RuntimeFilter.DimBrands: _*)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        graft.ops.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
    assert(got.collect().toSeq === plain.collect().toSeq)
  }

  test("probe prunes the fact side ahead of the exact join (few survivors)") {
    val fact = Tables.lineitem(spark, dir).count()
    val pruned = RuntimeFilter.bloomPrunedFact(spark, dir).count()
    val matching = Tables.lineitem(spark, dir)
      .join(graft.ops.RuntimeFilter.dim(spark, dir),
        col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(pruned >= matching, "bloom must keep every true match")
    // false-positive *rows*: survivors that the exact join drops
    val fpRows = pruned - matching
    assert(fpRows.toDouble <= 0.01 * fact,
      s"bloom passed $fpRows non-matching rows of $fact")
  }

  test("probe filter sits BELOW the fact-side shuffle in the physical plan") {
    val plan = RuntimeFilter.bloomPrefilteredJoin(spark, dir)
      .queryExecution.executedPlan match {
      // unwrap AQE so collect() descends into the actual operator tree
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(plan.toString.contains("SortMergeJoin"),
      "exact join must be the (pinned) sort-merge shape")
    // The probe lands as the broadcast(bloom)-join's CONDITION (Catalyst
    // fuses the filter into the nested-loop join node), so match the
    // expression anywhere in the exchange's subtree, not a FilterExec.
    val prunedExchanges = plan.collect {
      case e: ShuffleExchangeExec if e.collectLeaves().exists(
        _.toString.contains("lineitem")) &&
        e.toString.contains("graft_bloom_contains") => e
    }
    assert(prunedExchanges.nonEmpty,
      "graft_bloom_contains must filter the fact scan before its exchange")
  }
}
