package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline / Pareto-frontier operator (Börzsönyi et al., ICDE 2001): the
  * set of points no other point dominates (here: no part that is both
  * cheaper-or-equal AND larger-or-equal, strict in at least one
  * dimension).
  *
  * The naive plan is the quadratic NOT EXISTS self-join; for 2-D the
  * frontier is instead computable with sort + prefix-max — linear after
  * the sort. Dominance splits into two monotone tests over the
  * price-sorted axis:
  *   strictMax = max(size) over parts STRICTLY cheaper
  *   leMax     = max(size) over parts cheaper-or-equal (incl. own tie group)
  * dominated ⇔ strictMax ≥ size (a strictly cheaper part is at least as
  * big) OR leMax > size (a cheaper-or-equal part is strictly bigger);
  * exact duplicate points survive (neither test strict for them), per the
  * standard skyline definition. Both maxima come from the DISTINCT-PRICE
  * group table — aggregated, orders of magnitude smaller than the input —
  * via a TWO-PASS range-partitioned prefix-max: range-partition the
  * price groups, take the strict prefix-max per partition, then carry
  * each partition's total max forward through an exclusive prefix over
  * the PARTITION-COUNT-sized summary (a bounded broadcast self-join —
  * no single-partition window exists anywhere in the plan); the points
  * then broadcast-join back by price. Every pass is partition-parallel;
  * the only global structure is executor-count-sized, which is the shape
  * that holds at 100 TB.
  *
  * The DuckDB twin applies the dominance DEFINITION through two global
  * window maxima over the price-sorted distinct-price groups (see
  * [[paretoFrontierSql]]) — independent of the engine's
  * partition-parallel two-pass carry machinery (the nontrivial part
  * being validated), but O(n log n) instead of the naive NOT EXISTS
  * O(n²) that timed out at 1800 s on 2 M parts at sf100
  * (SCALE_r15 §4). The NOT EXISTS form remains as the definitional
  * reference in the Scaladoc there; `SkylineSpec` additionally pins the
  * engine result against an in-Spark quadratic anti-join at test SF. */
object Skyline {

  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val grp = pts.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).as("gmax"))
    // pass 1: per-range-partition strict prefix-max (equal prices land in
    // one partition, so the strict frame never splits a tie group)
    // localCheckpoint (eager) so BOTH consumers below (the per-partition
    // window and the per-partition max) read ONE materialized
    // partitioning: range boundaries come from sampling, and letting two
    // subtrees re-execute the exchange independently would let them
    // disagree on pid assignment — the pid join would then mix carries
    // across inconsistent partitionings.
    val parts = grp
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("p_retailprice"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parts.withColumn("local_strict", max(col("gmax")).over(wLocal))
    // pass 2: exclusive prefix-max of the per-partition totals — a
    // PARTITION-COUNT-sized table (≤ defaultParallelism rows: bounded by
    // cluster config at ANY data scale, stronger than census-bounded).
    // r21: one partitionBy-less window pass (a single-partition sort of
    // ≤ executor-count rows) instead of the broadcast ≤-self-join — the
    // kcore median-k treatment; the self-join's broadcast build was one
    // more plan-prepare job on a query that is ~95% scheduling floor.
    val pmax = parts.groupBy(col("pid")).agg(max(col("gmax")).as("pmax"))
    val wCarry = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = pmax.select(col("pid"), max(col("pmax")).over(wCarry).as("carry"))
    val bounds = local.join(broadcast(carry), Seq("pid"))
      .withColumn("strict_max", greatest(col("local_strict"), col("carry")))
      .withColumn("le_max", greatest(col("gmax"),
        coalesce(col("strict_max"), lit(Int.MinValue))))
    pts.join(broadcast(bounds), Seq("p_retailprice"))
      .filter(!(coalesce(col("strict_max") >= col("p_size"), lit(false)) ||
        col("le_max") > col("p_size")))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  /** The dominance definition, windowed. A point a is dominated iff
    * ∃ b: (price ≤, size ≥, strict in one), which splits exactly on the
    * price axis: a strictly-cheaper dominator exists iff
    * MAX(size | price < a.price) ≥ a.size, and a same-price dominator
    * exists iff MAX(size | price = a.price) > a.size. Both maxima come
    * from one ordered window over the distinct-price groups — the
    * brute-force definition minus the quadratic pairing (the r15 NOT
    * EXISTS twin: `... WHERE NOT EXISTS (SELECT 1 FROM part b WHERE
    * b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size AND
    * (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))` —
    * value-identical at sf0.01/sf0.1, oracle-intractable at sf100). */
  val paretoFrontierSql: String =
    """WITH g AS (
      |  SELECT p_retailprice, MAX(p_size) AS tie_max,
      |    MAX(MAX(p_size)) OVER (ORDER BY p_retailprice
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_max
      |  FROM part GROUP BY p_retailprice)
      |SELECT a.p_partkey, a.p_retailprice, a.p_size
      |FROM part a JOIN g USING (p_retailprice)
      |WHERE NOT (COALESCE(g.strict_max >= a.p_size, FALSE)
      |        OR g.tie_max > a.p_size)
      |ORDER BY a.p_retailprice, a.p_partkey""".stripMargin
}
