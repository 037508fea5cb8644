package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filtering for selective dim→fact joins — the
  * "runtime filter" / semi-join-pushdown pattern every warehouse engine
  * injects at scale (Spark's own InjectRuntimeFilter does exactly this
  * under AQE; here it is explicit, with graft-native build/probe
  * expressions, so the plan works in any regime and the sketch parameters
  * are ours to pin).
  *
  * Dataflow: the filtered dim's KEYS fold into a fixed-size bloom sketch
  * (one aggregate row, 16 KiB at 2¹⁷ bits — broadcastable no matter how
  * wide the dim rows are); the sketch embeds as a literal
  * in the fact scan's filter, where the codegen `graft_bloom_contains`
  * probe drops non-matching rows before the join exchange. The exact join then runs on the
  * survivors — false positives (a few per mille at these parameters) are
  * eliminated there, so the output is bit-identical to the unfiltered
  * join and the oracle twin is the PLAIN join SQL.
  *
  * Scale posture: this is the shape for when the dim is too big to
  * broadcast as a hash table but its key set still sketches small — the
  * fact side's exchange carries only matching rows (here ~12% of
  * lineitem), which at 100 TB is the difference between shuffling the
  * fact table and shuffling the join's answer. The exact join is pinned
  * to sort-merge (`hint("merge")`) to model that regime honestly;
  * `BloomJoinSpec` asserts the probe filter sits under the fact-side
  * exchange and that the sketch's false-positive rate stays ≪ 1%.
  */
object RuntimeFilter {

  private[graft] val BloomBitsFloor = 1 << 17
  private[graft] val DimBrands = Seq("Brand#3", "Brand#7", "Brand#17")

  /** Corpus-derived sketch size: ~10 bits per dim key keeps the
    * false-positive rate ≈1% at the probe's hash count, whatever the
    * corpus (the capacity-literal audit class: a FIXED 2¹⁷ bits
    * saturates once the dim key set outgrows it — FP → 1 and the
    * runtime filter silently degrades to a full-fact no-op; correctness
    * survives because the exact join follows, but the 100 TB plan
    * collapses to the unfiltered shuffle the filter exists to avoid).
    * Floor 2¹⁷ bits (16 KiB), cap 2²⁷ (16 MiB — still trivially
    * broadcastable; a dim whose key set outgrows even that has left the
    * selective-dim regime this operator models and should shuffle),
    * rounded up to the word multiple BloomBuildLongs requires. */
  private[graft] def bloomBitsFor(nKeys: Long): Int = {
    val want = math.max(BloomBitsFloor.toLong, 10L * nKeys)
    val capped = math.min(want, 1L << 27)
    (((capped + 63) / 64) * 64).toInt
  }

  private[graft] def dim(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_brand").isin(DimBrands: _*))
      .select(col("p_partkey"), col("p_brand"))

  /** Fact rows surviving the bloom probe — split out so the spec can
    * measure the pre-join selectivity and false-positive rate.
    *
    * The built sketch is collected to the driver and embedded as a
    * LITERAL in the probe predicate — the same shape Spark's own
    * InjectRuntimeFilter produces (bloom as a reusable scalar-subquery
    * result). The collect is CONSTANT-size by construction (BloomBits/8
    * bytes — 16 KiB — whatever the key count; same fenced pattern as the
    * IVF centroids, see Similarity.annIvf). The literal matters: a
    * broadcast-cross-join + filter formulation puts the probe into a
    * BroadcastNestedLoopJoin CONDITION, which evaluates interpreted, row
    * by row, outside whole-stage codegen — measured 2.6 s vs ~0.6 s at
    * sf0.1 for the identical result. As a literal the probe compiles
    * straight into the scan's generated loop. */
  private[graft] def bloomPrunedFact(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // size the sketch from the dim key count (one dim-sided count job —
    // the dim scan is the cheap side by the operator's own premise) and
    // fold count + build into one pass-shaped pair of dim jobs
    val dimDf = dim(spark, dir)
    val bits = bloomBitsFor(dimDf.count())
    val bf: Array[Byte] = dimDf
      .agg(call_function("graft_bloom_build",
        col("p_partkey"), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"))
      .filter(call_function("graft_bloom_contains", lit(bf), col("l_partkey")))
  }

  def bloomPrefilteredJoin(spark: SparkSession, dir: String): DataFrame =
    bloomPrunedFact(spark, dir)
      .join(dim(spark, dir).hint("merge"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .sortSmall(col("p_brand"))

  val bloomPrefilteredJoinSql: String =
    """SELECT p_brand, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand IN ('Brand#3', 'Brand#7', 'Brand#17')
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin
}
