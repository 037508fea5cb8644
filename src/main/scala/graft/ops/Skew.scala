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

  /** Join-side salting — the skewed-JOIN sibling of the aggregation
    * pattern above. `event_type` is the classic hot join key (5 values
    * over the whole fact table): a straight shuffle join on it lands
    * every row of a hot key on ONE reduce task. Salting splits the fact
    * side into `JoinSalts` deterministic sub-keys (hash of the row's
    * unique id — no rand(), so the plan replays identically) and
    * REPLICATES each enrichment row once per salt, so the join becomes a
    * uniform equi-join on (key, salt) with per-key parallelism `JoinSalts`
    * at the cost of a `JoinSalts`× blow-up of the small side only.
    *
    * The 5-row weights table here stands in for an enrichment side that
    * is too big to broadcast but small per key — the regime where
    * salting (or AQE's runtime skew split, spec'd in `SkewJoinSpec`) is
    * the remedy; a genuinely broadcastable dim should just broadcast
    * (`join_broadcast_dims`). The shuffle_hash hint pins the shuffled
    * join the pattern exists for — otherwise this demo would quietly
    * broadcast and exercise nothing. Result is bit-identical to the
    * unsalted join, which is exactly what the (unsalted) DuckDB twin
    * checks. */
  private[ops] val JoinSalts = 16

  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .withColumn("salt", pmod(hash(col("event_id")), lit(JoinSalts)))
    val dim = Seq(("click", 2.5), ("error", 0.0), ("purchase", 10.0),
      ("signup", 5.0), ("view", 1.0)).toDF("event_type", "weight")
    val dimSalted = dim.withColumn("salt",
      explode(array((0 until JoinSalts).map(lit(_)): _*)))
    e.join(dimSalted.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"), col("weight"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("s"))
      .select(col("event_type"), col("weight"), col("n_events"),
        col("s").cast("double").as("sum_value"),
        round(col("s").cast("double") * col("weight"), 4).as("weighted_value"))
      .orderBy(col("event_type"))
  }

  val saltedSkewJoinSql: String =
    """WITH dim AS (
      |  SELECT 'click' AS event_type, CAST(2.5 AS DOUBLE) AS weight
      |  UNION ALL SELECT 'error', CAST(0.0 AS DOUBLE)
      |  UNION ALL SELECT 'purchase', CAST(10.0 AS DOUBLE)
      |  UNION ALL SELECT 'signup', CAST(5.0 AS DOUBLE)
      |  UNION ALL SELECT 'view', CAST(1.0 AS DOUBLE))
      |SELECT e.event_type, d.weight, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  round(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) * d.weight, 4)
      |    AS weighted_value
      |FROM events e JOIN dim d ON d.event_type = e.event_type
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin
}
