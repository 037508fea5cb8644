package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-handling pattern (100 TB posture): two-stage salted aggregation.
  *
  * `events.event_type` has 5 values over millions of rows — the classic
  * hot-key shape where a naive groupBy sends each key to ONE reduce task.
  * Salting splits every key into `SaltBuckets` sub-keys for the first
  * (wide, parallel) aggregation, then a second (tiny) aggregation merges
  * the partials. Both stages are hash aggregates with map-side combine;
  * the result is identical to the direct groupBy — which is exactly what
  * the DuckDB twin checks.
  *
  * (With AQE's skew handling this is often unnecessary for joins, but
  * aggregation-side hot keys still need the pattern; it must produce
  * bit-identical results to the unsalted plan — guaranteed here because
  * counts and decimal sums are exactly mergeable.)
  */
object Skew {

  private val SaltBuckets = 16

  def saltedHotKeyAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val salted = e
      .withColumn("salt", pmod(hash(col("event_id")), lit(SaltBuckets)))
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(18, 4))).as("psum"))
    salted
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).cast("long").as("n_events"),
        sum(col("psum")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val saltedHotKeyAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
