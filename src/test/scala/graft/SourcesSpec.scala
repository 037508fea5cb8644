package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CSV/JSON round-trips must be lossless: the census computed after the
  * round-trip equals the census computed straight off the parquet —
  * including the double-typed sums (shortest-round-trip serialization). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def direct() =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))

  test("CSV round-trip census is bit-identical to the direct census") {
    val rt = Sources.csvRoundtrip(spark, dir)
    assert(rt.exceptAll(direct()).count() === 0L)
    assert(direct().exceptAll(rt).count() === 0L)
  }

  test("JSON round-trip census is bit-identical to the direct census") {
    val rt = Sources.jsonRoundtrip(spark, dir)
    assert(rt.exceptAll(direct()).count() === 0L)
    assert(direct().exceptAll(rt).count() === 0L)
  }
}
