package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sources/sinks at-scale posture: partitioned parquet layout written with
  * partitionBy must (a) round-trip values, (b) prune partitions at read
  * time — the physical design that makes date-keyed 100 TB scans viable. */
class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("partitionBy layout round-trips and prunes at read time") {
    val out = Files.createTempDirectory("orders_part").toString + "/orders"
    val o = Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
    o.write.mode("overwrite").partitionBy("order_year").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() === o.count())

    // a filter on the partition column must become a PartitionFilter
    // (pruned scan), not a data filter over all files
    val pruned = back.filter(col("order_year") === 1997)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
    assert(scan.contains("order_year"))
    val expected = o.filter(col("order_year") === 1997).count()
    assert(pruned.count() === expected)

    // partition directories actually exist per year
    val years = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("order_year="))
    assert(years.length > 1)
  }

  test("csv and json sinks round-trip a projected table") {
    val n = Tables.nation(spark, dir)
    val base = Files.createTempDirectory("sink_rt").toString

    n.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.option("header", "true")
      .schema(n.schema).csv(s"$base/csv")
    assert(csvBack.exceptAll(n).count() === 0L)
    assert(n.exceptAll(csvBack).count() === 0L)

    n.write.mode("overwrite").json(s"$base/json")
    val jsonBack = spark.read.schema(n.schema).json(s"$base/json")
    assert(jsonBack.exceptAll(n).count() === 0L)
    assert(n.exceptAll(jsonBack).count() === 0L)
  }

  test("orc sink round-trips with predicate pushdown at read time") {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = Files.createTempDirectory("sink_orc").toString
    o.write.mode("overwrite").orc(base)
    val back = spark.read.orc(base)
    assert(back.exceptAll(o).count() === 0L)
    assert(o.exceptAll(back).count() === 0L)
    // ORC scans take pushed filters like parquet ones
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("100000"),
      s"expected pushed filter in ORC scan:\n$plan")
  }
}
