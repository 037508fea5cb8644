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
