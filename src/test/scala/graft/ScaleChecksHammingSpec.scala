package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r20 full-corpus banding recount leg of
  * [[ScaleChecks.simhashCheck]] (r19 VERDICT task 5) the way
  * ScaleChecksGraphSpec pins the graph recounts: a faithful dump must
  * PASS, a dump with a pair REMOVED must fail (completeness — the
  * recount re-derives the missing candidate), and a dump with a bogus
  * pair ADDED must fail (soundness). The recount is the only full-SF
  * completeness evidence at the decades where the all-pairs twin and
  * the slice-truth cartesian are both out of reach, so it must not be
  * able to degrade into always-green. */
class ScaleChecksHammingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: 17 simhash pairs — non-empty, so the canaries cannot no-op
  private val sfDir = TestSpark.sfDir("0.01")

  private lazy val outDir: String = {
    val d = TestSpark.tempDir("scalechecks-hamming")
    Dedup.simhash(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/dedup_simhash")
    d
  }

  test("simhash_check passes on a faithful dump (incl. recount leg)") {
    val (name, pass, detail) = ScaleChecks.simhashCheck(spark, sfDir, outDir)
    assert(name == "simhash_check")
    assert(pass, detail.toString)
    assert(detail("pairs") > 0)
    assert(detail("recount_missing") == 0 && detail("recount_extra") == 0)
  }

  test("simhash_check canary: a dropped pair must fail the recount") {
    val bad = TestSpark.tempDir("scalechecks-sim-dropped")
    val d = spark.read.parquet(s"$outDir/dedup_simhash")
    val first = d.orderBy(col("d1"), col("d2")).limit(1)
    d.exceptAll(first)
      .write.mode("overwrite").parquet(s"$bad/dedup_simhash")
    val (_, pass, detail) = ScaleChecks.simhashCheck(spark, sfDir, bad)
    assert(!pass)
    assert(detail("recount_missing").asInstanceOf[Long] > 0, detail.toString)
  }

  test("simhash_check canary: an added bogus pair must fail") {
    val bad = TestSpark.tempDir("scalechecks-sim-added")
    val d = spark.read.parquet(s"$outDir/dedup_simhash")
    // a fabricated far-apart pair: ids exist but are no near-dups
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).orderBy(col("doc_id")).limit(2)
      .collect().map(_.getLong(0))
    val bogus = spark.range(1).select(
      lit(ids(0)).as("d1"), lit(ids(1)).as("d2"),
      lit(0L).as("hamming"))
    d.unionByName(bogus.select(d.columns.map(col): _*))
      .write.mode("overwrite").parquet(s"$bad/dedup_simhash")
    val (_, pass, _) = ScaleChecks.simhashCheck(spark, sfDir, bad)
    assert(!pass)
  }
}
