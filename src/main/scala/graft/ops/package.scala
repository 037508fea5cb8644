package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for the operator inventory (SURVEY.md §2b).
  *
  * Cross-engine determinism rules (the driver hash-compares our parquet
  * output against DuckDB running `SparkEntry.oracleSql` on the same inputs):
  *
  *   - Sums/averages over doubles are NOT order-independent; Spark's partial
  *     aggregation across 32 shuffle partitions and DuckDB's sequential sum
  *     differ in the last ulps. We cast to DECIMAL(18,4) first (exact,
  *     associative) and cast the exact result back to double — both engines
  *     produce the bit-identical double. Oracle twin fragment:
  *     `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  *   - Every query ends in a total ORDER BY over a unique key combination.
  *   - min/max/count and pure per-row arithmetic on doubles are exact and
  *     need no special handling.
  *   - DuckDB's SUM over BIGINT returns HUGEINT (arrow DECIMAL(38,0)) —
  *     plain AND windowed (`SUM(n) OVER (...)`) — and `//` division
  *     propagates it. Spark's sum(long) stays BIGINT. The driver's hash
  *     is TYPE-sensitive even when values are equal, so every twin
  *     integer sum (and anything derived from one) needs
  *     `CAST(... AS BIGINT)`. `tools/check_oracle.py` compares arrow
  *     type classes and flags this locally (the r7 red class:
  *     agg_mode_per_group / ts_markov_transitions /
  *     graph_pagerank_bipartite all forgot the cast on a windowed sum).
  *   - Integer-overflow symmetry: Spark wraps long·long silently; DuckDB
  *     promotes to HUGEINT (or errors). Any product that can exceed 2⁶³
  *     at the 100 TB posture must either accumulate in DECIMAL on the
  *     Spark side (see `sum(n.cast("decimal(19,0)") * n)` in
  *     giniImpurity/anomalyZscore), pre-reduce its operands (domainQuota
  *     hashes `doc_id % p` before multiplying), or rescale its fixed
  *     point to document-scale operands (bm25TopK's avgdl form) — the
  *     claim "fits int64" must hold for per-ROW/per-GROUP quantities,
  *     not only at test SFs.
  */
package object ops {

  /** Order-independent, cross-engine-exact sum of a double expression. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Cross-engine-exact average built from the exact sum.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)`. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1))

  /** Exact interpolated percentiles via ONE sort-exchange window plan.
    *
    * Spark's `percentile()` aggregate buffers the full per-group value
    * list (boxed, serialized across the exchange in partial mode, or
    * group-cardinality-parallel after a pre-repartition) — measured
    * 1.8–2.4 s per query at sf0.1 for 3-row outputs. The sorted-rank
    * formulation computes the same interpolated values from boundary
    * rows only: rank each distinct value column with `row_number` over
    * the group-key exchange (all rank orders ride ONE exchange — a
    * re-sort per value column, no extra shuffle), keep only the rows at
    * `floor/ceil(p·(n−1))` positions, and assemble Spark `percentile`'s
    * exact expression `(ceil−pos)·v_lo + (pos−floor)·v_hi` (bit-identical
    * to the aggregate's `getPercentile`, so oracle behavior is unchanged)
    * in a tiny group-sized aggregate. Tungsten radix sort replaces the
    * list-buffer accumulation; at 100 TB this is the classic
    * rank-selection quantile plan (sort once, touch k boundary rows).
    *
    * `specs` = (valueColumn, p, outputName); value columns MUST be
    * non-null (callers filter first — `percentile` ignores nulls, the
    * shared `n` here must too). One row per group, unrounded doubles. */
  def exactPercentiles(df: org.apache.spark.sql.DataFrame, group: String,
      specs: Seq[(String, Double, String)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vcols = specs.map(_._1).distinct
    val base = df.select((col(group) +: vcols.map(col)): _*)
    val ranked = vcols.foldLeft(base) { (d, v) =>
        d.withColumn(s"__rn_$v",
          row_number().over(Window.partitionBy(col(group)).orderBy(col(v))))
      }
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(group))))
    def pos(p: Double): Column =
      lit(p) * (col("__n") - 1).cast(DoubleType)
    val keep = specs.map { case (v, p, _) =>
      col(s"__rn_$v") === (floor(pos(p)) + 1) ||
        col(s"__rn_$v") === (ceil(pos(p)) + 1)
    }.reduce(_ || _)
    val aggs = specs.flatMap { case (v, p, out) =>
      Seq(
        min(when(col(s"__rn_$v") === (floor(pos(p)) + 1), col(v)))
          .as(s"__lo_$out"),
        min(when(col(s"__rn_$v") === (ceil(pos(p)) + 1), col(v)))
          .as(s"__hi_$out"))
    } :+ max(col("__n")).as("__nn")
    val agged = ranked.filter(keep)
      .groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
    val outs = specs.map { case (_, p, out) =>
      val ps = lit(p) * (col("__nn") - 1).cast(DoubleType)
      val lo = floor(ps)
      val hi = ceil(ps)
      when(lo === hi, col(s"__lo_$out").cast(DoubleType))
        .otherwise(
          (hi.cast(DoubleType) - ps) * col(s"__lo_$out").cast(DoubleType) +
            (ps - lo.cast(DoubleType)) * col(s"__hi_$out").cast(DoubleType))
        .as(out)
    }
    agged.select((col(group) +: outs): _*)
  }
}
