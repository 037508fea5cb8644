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
}
