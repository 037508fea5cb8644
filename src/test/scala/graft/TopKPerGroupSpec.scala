package graft

import graft.plans.{GraftOps, TopKPerGroupExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator extension: logical node planned by the
  * injected strategy into partial+final bounded-heap execs, agreeing
  * exactly with the window-function formulation. */
class TopKPerGroupSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("native top-k matches the window formulation exactly") {
    val native = ops.Windows.topkPerGroupNative(spark, dir)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
    val window = ops.Windows.topkPerGroup(spark, dir)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
    assert(native.exceptAll(window).count() === 0)
    assert(window.exceptAll(native).count() === 0)
  }

  test("plans as partial + final custom operators around one exchange") {
    val df = ops.Windows.topkPerGroupNative(spark, dir)
    df.collect() // execute THIS plan so its adaptive plan is final
    val plan = df.queryExecution.executedPlan
    val topks = collect(plan) { case t: TopKPerGroupExec => t }
    assert(topks.map(_.partial).sorted === Seq(false, true),
      s"expected one partial and one final TopKPerGroupExec, got $topks")
    val shufflesBelowFinal = topks.filter(!_.partial).flatMap(t =>
      collect(t) { case s: ShuffleExchangeExec => s })
    assert(shufflesBelowFinal.nonEmpty,
      "final phase must sit above the group-key exchange")
  }

  test("k larger than the group emits the whole group, ordered") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("g", "v")
    val out = GraftOps.topKPerGroup(df, Seq("g"), Seq("v" -> false), k = 10)
      .orderBy("g", "v").as[(String, Long)].collect()
    assert(out === Array(("a", 1L), ("a", 3L), ("b", 2L)))
  }

  test("heap keeps the best k under a total order with duplicates") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => ("g", i % 10, i))
    val df = rows.toDF("g", "v", "id")
    val out = GraftOps.topKPerGroup(
        df, Seq("g"), Seq("v" -> true, "id" -> true), k = 3)
      .as[(String, Long, Long)].collect().toSet
    // v=9 rows with the 3 largest ids: 99, 89, 79
    assert(out === Set(("g", 9L, 99L), ("g", 9L, 89L), ("g", 9L, 79L)))
  }
}
