package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join mechanics: a pathologically skewed join key must be
  * split at runtime (OptimizeSkewedJoin) instead of landing on one
  * reducer — the runtime half of the skew story whose static half is
  * `agg_salted_skew`. Thresholds are lowered to make the 100k-row hot
  * key "skewed" at test scale; production defaults (256 MB) encode the
  * same mechanics. */
class SkewJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // the final count() would otherwise veto the split (it adds a
      // shuffle after the join); force says "split anyway"
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      // 100k rows on key 0, a handful elsewhere; right side small per key.
      // v is hashed so the hot partition's shuffle blocks don't compress
      // away below the (lowered) skew threshold.
      val left = spark.range(0, 100000).select(
        when(col("id") < 99000, 0L).otherwise(col("id") % 100).as("k"),
        xxhash64(col("id")).as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // execute THIS plan (count() would spawn its own QueryExecution and
      // leave joined's adaptive plan unexecuted / unoptimized)
      assert(joined.collect().length === 100000)

      val smjs = collect(joined.queryExecution.executedPlan) {
        case s: SortMergeJoinExec => s
      }
      assert(smjs.nonEmpty, "expected a sort-merge join under AQE")
      assert(smjs.exists(_.isSkewJoin),
        s"expected OptimizeSkewedJoin to mark the join (isSkewJoin=true); got ${smjs.map(_.isSkewJoin)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("salted skew join shuffles on (key, salt) and never broadcasts or plain-shuffles") {
    val df = graft.ops.Skew.saltedSkewJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val p = plan.toString
    assert(!p.contains("BroadcastHashJoin"),
      "the salted demo must keep the shuffled join it demonstrates")
    val joins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, "expected a shuffled hash join")
    assert(joins.head.leftKeys.size == 2,
      "join must be keyed on (event_type, salt), not event_type alone")
    // correctness: identical to the unsalted join+agg
    import spark.implicits._
    val unsalted = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val got = df.select(col("event_type"), col("n_events"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = unsalted.as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }
}
