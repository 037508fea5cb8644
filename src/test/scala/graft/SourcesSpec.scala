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

  test("scratch dirs are stable across repeated invocations (one root per JVM)") {
    // 100 calls must resolve to the same fixed paths under ONE shared root
    // — the old implementation created a fresh tmp dir + shutdown hook per
    // call, which accumulated both in a long-lived session.
    val paths = (1 to 100).map(_ => Sources.tempDir("graft_csv_rt")).toSet
    assert(paths.size === 1)
    val roots = (1 to 100)
      .map(_ => new java.io.File(Sources.tempDir("x")).getParent).toSet
    assert(roots.size === 1)
  }
}
