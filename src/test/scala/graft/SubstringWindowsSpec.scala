package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the exact substring-window dedup census
  * (Lee-et-al-style cross-document span duplication). */
class SubstringWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("census bounds and fixed-point arithmetic are internally consistent") {
    import spark.implicits._
    val rows = Dedup.substringWindows(spark, dir)
      .select("doc_id", "n_windows", "n_dup_windows", "dup_fp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nw, nd, fp) =>
      assert(nw > 0, s"doc $id emitted with zero windows")
      assert(nd >= 0 && nd <= nw, s"doc $id: dup count $nd outside [0, $nw]")
      assert(fp === nd * 1000000L / nw, s"doc $id: dup_fp mismatch")
    }
  }

  test("duplicated-window counts re-derive via an independent join-based dataflow") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The operator flags windows by groupBy + countDistinct(doc) >= 2;
    // re-derive the same census with a self-JOIN across distinct docs
    // (different dataflow, same semantics) and require exact agreement.
    val wins = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 7), i -> array_join(slice(toks, i, 8), ' '))"))
        .as("win"))
    val crossDocWins = wins.as("a").join(wins.as("b"),
        col("a.win") === col("b.win") && col("a.doc_id") =!= col("b.doc_id"),
        "left_semi")
    val expected = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"))
      .join(crossDocWins.groupBy(col("doc_id")).agg(count(lit(1)).as("nd")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("nw"), coalesce(col("nd"), lit(0L)).as("nd"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val actual = Dedup.substringWindows(spark, dir)
      .select("doc_id", "n_windows", "n_dup_windows")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(actual === expected)
    // Distribution sanity: the synthetic near-dups must light up the
    // census — some docs fully covered, most untouched.
    val fps = Dedup.substringWindows(spark, dir)
      .select("dup_fp").as[Long].collect()
    assert(fps.contains(1000000L), "expected at least one fully-covered doc")
    assert(fps.count(_ == 0L) > fps.length / 2, "most docs should be clean")
  }

  test("deterministic across runs") {
    val a = Dedup.substringWindows(spark, dir).collect().toSeq
    val b = Dedup.substringWindows(spark, dir).collect().toSeq
    assert(a === b)
  }
}
