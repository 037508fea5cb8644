package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
