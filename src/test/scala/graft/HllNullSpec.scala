package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the r18 ADVICE fix: hllIntersection's one-scan
  * exact-leg rewrite must IGNORE NULL user_ids like the old
  * countDistinct legs and the DuckDB twin's COUNT(DISTINCT CASE...) —
  * without the filter, the distinct (pid, isA, NULL) row survives into
  * count(when(isA, 1)) and inflates exact_a/exact_b by one. The
  * generated tables are currently non-null, so this synthesizes the
  * dirty corpus the generator never produces. */
class HllNullSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hll_intersection exact legs ignore NULL user_id") {
    val base = spark.read.parquet(s"${TestSpark.sfDir("0.001")}/events.parquet")
    val tmp = TestSpark.tempDir("hllnull")
    base.write.mode("overwrite").parquet(s"$tmp/clean/events.parquet")
    // one NULL-user row per event type that participates in a pair —
    // each would shift exact_a or exact_b by exactly 1 if counted
    val nulls = base
      .filter(col("event_type").isin("click", "purchase", "view", "signup"))
      .dropDuplicates("event_type")
      .withColumn("user_id", lit(null).cast("long"))
    base.unionByName(nulls)
      .write.mode("overwrite").parquet(s"$tmp/dirty/events.parquet")
    val exactCols = Seq("type_a", "type_b", "exact_a", "exact_b",
      "exact_union", "exact_inter").map(col)
    val clean = Aggregations.hllIntersection(spark, s"$tmp/clean")
      .select(exactCols: _*)
    val dirty = Aggregations.hllIntersection(spark, s"$tmp/dirty")
      .select(exactCols: _*)
    assert(dirty.exceptAll(clean).isEmpty && clean.exceptAll(dirty).isEmpty)
  }
}
