package graft.streaming

import graft.Tables
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom stateful operator of the
  * inventory. One pure fold (`foldSessions`) backs two execution shapes:
  *
  *  - batch: `groupByKey(user).flatMapGroups` — sessions within the batch;
  *  - streaming: `flatMapGroupsWithState` keeping an open session per user
  *    in `GroupState`, emitting a session when the gap closes it, with
  *    event-time timeout (watermark-driven) flushing idle users.
  *
  * Scale: state is O(1) per user (just the open session), the shuffle is
  * on user_id only — the standard unbounded-stream posture.
  *
  * Event time is instant-typed (TimestampType) because Spark watermarks
  * reject TIMESTAMP_NTZ; with a UTC session the wall-clock values match the
  * NTZ batch tables, and batch output converts back to NTZ so the DuckDB
  * gaps-and-islands twin (lag → flag → cumulative sum → group) compares
  * exactly.
  */
object Sessionize {

  val GapSeconds = 1800L

  case class Ev(user_id: Long, event_id: Long, ts: Instant)
  case class Session(user_id: Long, session_id: Long, session_start: Instant,
    session_end: Instant, n_events: Long)
  case class OpenSession(start: Instant, end: Instant, n: Long, emitted: Long)

  private def epoch(t: Instant): Long = t.getEpochSecond

  /** Fold time-sorted events of one user into gap-closed sessions. */
  def foldSessions(userId: Long, evs: Iterator[Ev]): Iterator[Session] = {
    val sorted = evs.toArray.sortBy(e => (epoch(e.ts), e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[Session]
      var sid = 0L
      var start = sorted.head.ts
      var end = sorted.head.ts
      var n = 1L
      sorted.iterator.drop(1).foreach { e =>
        if (epoch(e.ts) - epoch(end) > GapSeconds) {
          sid += 1
          out += Session(userId, sid, start, end, n)
          start = e.ts; end = e.ts; n = 1L
        } else {
          end = e.ts; n += 1
        }
      }
      sid += 1
      out += Session(userId, sid, start, end, n)
      out.result().iterator
    }
  }

  /** Batch sessionization as a queries entry.
    *
    * Hot-path note: the fold runs over primitive (Long, Long, Long) tuples
    * — user, event, epoch-µs — instead of Instant-bearing case classes;
    * tuple encoders serialize flat without object construction, which cut
    * this query ~2× at sf0.1. Timestamps are rebuilt as columns afterwards
    * (timestamp_micros, then NTZ for the DuckDB twin). */
  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, rows: Iterator[(Long, Long, Long)]) =>
        // sort by full-precision µs (matches the oracle's ORDER BY ts) so
        // session_end is the true max; the GAP stays second-truncated to
        // match date_diff('second') boundary counting
        val sorted = rows.toArray.sortBy(r => (r._3, r._2))
        if (sorted.isEmpty) Iterator.empty
        else {
          val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
          var sid = 0L; var start = sorted.head._3; var end = sorted.head._3; var n = 1L
          var i = 1
          while (i < sorted.length) {
            val t = sorted(i)._3
            if (t / 1000000L - end / 1000000L > GapSeconds) {
              sid += 1; out += ((uid, sid, start, end, n))
              start = t; end = t; n = 1L
            } else { end = t; n += 1 }
            i += 1
          }
          sid += 1; out += ((uid, sid, start, end, n))
          out.result().iterator
        }
      }
      .toDF("user_id", "session_id", "start_us", "end_us", "n_events")
      .select(col("user_id"), col("session_id"),
        expr("cast(timestamp_micros(start_us) as timestamp_ntz)").as("session_start"),
        expr("cast(timestamp_micros(end_us) as timestamp_ntz)").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionsBatchSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN date_diff('second',
      |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
      |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |islands AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, MIN(ts) AS session_start,
      |  MAX(ts) AS session_end, COUNT(*) AS n_events
      |FROM islands GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Streaming sessionization over a typed stream: open session per user in
    * GroupState; a new event either extends it or closes-and-emits it.
    * Callers must not re-watermark (applied here: 2 hours). */
  def sessionizeStream(evs: Dataset[Ev]): Dataset[Session] = {
    import evs.sparkSession.implicits._
    evs
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.emitted + 1, s.start, s.end, s.n))
          } else {
            val sorted = it.toArray.sortBy(e => (epoch(e.ts), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if epoch(e.ts) - epoch(s.end) > GapSeconds =>
                  closed += Session(uid, s.emitted + 1, s.start, s.end, s.n)
                  open = Some(OpenSession(e.ts, e.ts, 1L, s.emitted + 1))
                case Some(s) =>
                  open = Some(s.copy(end = e.ts, n = s.n + 1))
                case None =>
                  open = Some(OpenSession(e.ts, e.ts, 1L, 0L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                epoch(s.end) * 1000L + GapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
