package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing at-scale posture: two tables bucketed on the join key must
  * sort-merge join with ZERO shuffle exchanges — the co-located join that
  * turns a repeated 100 TB fact⋈fact shuffle into a scan-side property. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    // disable broadcast so the test proves bucketing, not broadcasting
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("inventory query join_bucketed_colocated runs with zero hash exchanges") {
    val df = graft.ops.Joins.bucketedColocated(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join + bucket-key aggregation must not shuffle:\n$p")
  }

  private def bucketedJoinBody(): Unit = {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")

    val joined = spark.sql(
      """SELECT /*+ MERGE(o) */ o.o_orderkey, count(*) AS n
        |FROM orders_bkt o JOIN lineitem_bkt l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderkey""".stripMargin)
    joined.collect()

    val shufflesBeforeAgg = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // the join itself must be shuffle-free; the only permissible exchange
    // would be for the aggregation, but grouping on the bucket key makes
    // even that unnecessary
    assert(shufflesBeforeAgg.isEmpty,
      s"expected zero shuffles, plan:\n${joined.queryExecution.executedPlan}")

    // and the result matches the unbucketed join
    val plain = Tables.orders(spark, dir).as("o")
      .join(Tables.lineitem(spark, dir).as("l"),
        col("o.o_orderkey") === col("l.l_orderkey"))
      .groupBy(col("o.o_orderkey")).agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(joined).count() === 0L)
  }
}
