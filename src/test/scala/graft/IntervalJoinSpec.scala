package graft.ops

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned interval join must (a) keep the exact theta semantics on
  * every boundary and (b) never degrade to a cartesian/nested-loop plan —
  * the whole point of the bin replication. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def ev(id: Long, user: Long, typ: String, ts: String) =
    (user, id, typ, Timestamp.valueOf(ts), 0.0, "{}")

  private def frame(rows: Seq[(Long, Long, String, Timestamp, Double, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ts", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  test("interval boundaries: inclusive at -1h, exclusive at 0, cross-bin complete") {
    // error at 12:30:00. Candidates:
    //   11:30:00 exactly 1h before -> INCLUDED (>= lower bound)
    //   11:29:59 -> excluded (outside window)
    //   11:45:00 previous hour bin -> included (cross-bin recall)
    //   12:29:59 same bin -> included
    //   12:30:00 equal ts -> EXCLUDED (strict <)
    //   12:31:00 after -> excluded
    //   other user 12:00:00 -> excluded
    val rows = Seq(
      ev(100L, 1L, "error", "2024-03-01 12:30:00"),
      ev(1L, 1L, "view", "2024-03-01 11:30:00"),
      ev(2L, 1L, "view", "2024-03-01 11:29:59"),
      ev(3L, 1L, "view", "2024-03-01 11:45:00"),
      ev(4L, 1L, "view", "2024-03-01 12:29:59"),
      ev(5L, 1L, "view", "2024-03-01 12:30:00"),
      ev(6L, 1L, "view", "2024-03-01 12:31:00"),
      ev(7L, 2L, "view", "2024-03-01 12:00:00"))
    val out = AdvancedJoins.priorEventsWindowDf(frame(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 3L))
  }

  test("zero-match error keeps a row with n_prior = 0") {
    val rows = Seq(
      ev(100L, 1L, "error", "2024-03-01 12:30:00"),
      ev(1L, 1L, "view", "2024-03-01 09:00:00"))
    val out = AdvancedJoins.priorEventsWindowDf(frame(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 0L))
  }

  test("errors count as prior events too, and replicas never double-count") {
    // two errors 30 min apart: the later one sees the earlier one once,
    // even though the probe row is replicated into two bins
    val rows = Seq(
      ev(100L, 1L, "error", "2024-03-01 12:00:30"),
      ev(101L, 1L, "error", "2024-03-01 12:30:00"))
    val out = AdvancedJoins.priorEventsWindowDf(frame(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 0L, 101L -> 1L))
  }

  test("the plan is an equi-join: no cartesian or nested-loop node") {
    val plan = AdvancedJoins.priorEventsWindow(spark, dir)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"interval join must stay an equi-join, found: $bad")
  }
}
