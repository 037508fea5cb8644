package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event-processing (CEP) shapes: order-sensitive pattern matching
  * over per-key event sequences — the batch twin of MATCH_RECOGNIZE
  * (SQL:2016 row-pattern recognition) and of Flink's CEP library, neither
  * of which Spark SQL exposes natively.
  *
  * The encoding trick: each user's events collapse to ONE ordered string
  * (one char per event, first letter of the event type — the five
  * reference types start with distinct letters), and the row-pattern is a
  * plain regular expression over that string. This turns sequence
  * predicates ("a view, then any clicks, then a purchase") into per-row
  * regex work inside whole-stage codegen — no self-joins, no window
  * explosion, one shuffle on the grouping key.
  *
  * Scale posture: per-user sequences are bounded (events per user, not
  * corpus size), `collect_list` partially aggregates map-side, and the
  * regex evaluates once per USER, not per event. A 100 TB corpus with
  * billions of users is exactly this plan — hash-shuffle on user_id, then
  * embarrassingly parallel regex. Sequences long enough to blow a single
  * row (multi-GB users) are the same pathological-key problem as any
  * skewed aggregate: salt or cap (the funnel/sessionize entries show the
  * windowed alternatives that never materialize the full sequence).
  */
object Sequence {

  /** Per-user conversion patterns over the full ordered event history:
    *  - `seq`: the ordered event-initial string (deterministic order:
    *    ts, then event_id for same-timestamp ties);
    *  - `n_conversions`: non-overlapping matches of view→clicks*→purchase
    *    (both engines scan leftmost non-overlapping, so counts agree);
    *  - `error_then_purchase`: did an error precede a later purchase with
    *    no intervening error-resolution (any non-purchase path)? */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ti")).as("s"))
      .groupBy(col("user_id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(s)), x -> x.ti)"), "")
        .as("seq"))
      .select(
        col("user_id"), col("seq"),
        length(col("seq")).as("n_events"),
        expr("cast(regexp_count(seq, 'vc*p') as int)").as("n_conversions"),
        col("seq").rlike("e[cvs]*p").as("error_then_purchase"))
      .orderBy(col("user_id"))
  }

  val patternMatchSql: String =
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
      |      AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, seq,
      |  CAST(len(seq) AS INTEGER) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS INTEGER)
      |    AS n_conversions,
      |  regexp_matches(seq, 'e[cvs]*p') AS error_then_purchase
      |FROM s ORDER BY user_id""".stripMargin

  /** Top-k user journey paths (the product-analytics "path analysis"
    * rollup): the 20 most common consecutive 3-event type sequences
    * across all users, ties broken by path string. Two lead() windows
    * on ONE (user_id)-keyed exchange build the sliding triple per event
    * row — no self-joins, no per-user collect — then a
    * map-side-combined count aggregate ranks paths. The same dataflow
    * at any session length: a k-step path is k−1 leads on the same
    * exchange.
    *
    * Scale posture: one exchange on user_id (window), one on the path
    * key (aggregate, partial-combined), top-k via the final sort-limit
    * — the canonical journey rollup at warehouse scale. */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val topPathsSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      |FROM t WHERE t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin
}
