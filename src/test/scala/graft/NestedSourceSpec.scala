package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The nested round-trip's scale claim is NESTED COLUMN PRUNING: a
  * subfield projection must reach the parquet scan as a pruned
  * ReadSchema (items.element.l_quantity only), or a 100 TB
  * orders-with-items layout re-reads whole structs for single-field
  * queries. Value-level losslessness is the driver gate's job; the plan
  * shape is pinned here. */
class NestedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("subfield projection prunes the nested ReadSchema to one struct field") {
    val out = Sources.tempDir("graft_nested_prune_probe")
    Sources.nestedWrite(spark, dir, out)
    val plan = spark.read.parquet(out)
      .select(explode(col("items")).as("it"))
      .select(col("it.l_quantity"))
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in plan:\n$plan"))
    assert(readSchema.contains("l_quantity"),
      s"projected field missing from scan schema: $readSchema")
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_linenumber"),
      s"nested pruning failed — scan reads unprojected subfields: $readSchema")
  }

  test("nested round-trip census equals the flat-side census") {
    import spark.implicits._
    val Seq((nOrders, nItems, maxItems, sumQty)) =
      Sources.nestedStructRoundtrip(spark, dir)
        .as[(Long, Long, Int, Double)].collect().toSeq
    val li = graft.Tables.lineitem(spark, dir)
    assert(nOrders === li.select(col("l_orderkey")).distinct().count())
    assert(nItems === li.count())
    assert(maxItems > 0 && sumQty > 0.0)
  }
}
