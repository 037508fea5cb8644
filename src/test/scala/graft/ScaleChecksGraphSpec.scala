package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 engine-side graph checks ([[ScaleChecks.triangleCheck]],
  * [[ScaleChecks.linkpredCheck]]) the way CapAuditSpec pins the cap
  * audit: a faithful dump must PASS, and a canary-corrupted dump must
  * FAIL — so the checks cannot silently degrade into always-green while
  * they carry the only above-mod-20 evidence for these two queries (the
  * wedge twins are the documented pre-cap oracle frontier). */
class ScaleChecksGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01, not sf0.001: the smallest fixture's co-occurrence graph has
  // ZERO triangles, which would let the inflated-count canary no-op
  // (empty == empty) — the canary needs a non-empty dump to corrupt
  private val sfDir = TestSpark.sfDir("0.01")

  private lazy val outDir: String = {
    val d = TestSpark.tempDir("scalechecks-graph")
    Graph.triangleCount(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/graph_triangle_count")
    Graph.linkPrediction(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/graph_link_prediction")
    Graph.labelPropagation(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/graph_label_propagation")
    Graph.modularity(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/graph_modularity")
    Graph.assortativity(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/graph_assortativity")
    d
  }

  test("triangle_check passes on a faithful dump") {
    val (name, pass, detail) = ScaleChecks.triangleCheck(spark, sfDir, outDir)
    assert(name == "triangle_check")
    assert(pass, detail.toString)
    assert(detail("dump_rows") > 0)
  }

  test("linkpred_check passes on a faithful dump") {
    val (_, pass, detail) = ScaleChecks.linkpredCheck(spark, sfDir, outDir)
    assert(pass, detail.toString)
    assert(detail("adjacent_dumped") == 0)
  }

  test("triangle_check canary: an inflated count must fail") {
    val bad = TestSpark.tempDir("scalechecks-tri-bad")
    spark.read.parquet(s"$outDir/graph_triangle_count")
      .withColumn("n_triangles", col("n_triangles") + 1)
      .write.mode("overwrite").parquet(s"$bad/graph_triangle_count")
    val (_, pass, _) = ScaleChecks.triangleCheck(spark, sfDir, bad)
    assert(!pass)
  }

  test("modularity_check passes on a faithful dump") {
    val (_, pass, detail) = ScaleChecks.modularityCheck(spark, sfDir, outDir)
    assert(pass, detail.toString)
  }

  test("assortativity_check passes on a faithful dump") {
    val (_, pass, detail) = ScaleChecks.assortativityCheck(spark, sfDir, outDir)
    assert(pass, detail.toString)
  }

  test("modularity_check canary: a shifted census must fail") {
    val bad = TestSpark.tempDir("scalechecks-mod-bad")
    spark.read.parquet(s"$outDir/graph_label_propagation")
      .write.mode("overwrite").parquet(s"$bad/graph_label_propagation")
    spark.read.parquet(s"$outDir/graph_modularity")
      .withColumn("e_intra", col("e_intra") + 1)
      .write.mode("overwrite").parquet(s"$bad/graph_modularity")
    val (_, pass, _) = ScaleChecks.modularityCheck(spark, sfDir, bad)
    assert(!pass)
  }

  test("assortativity_check canary: a perturbed scalar must fail") {
    val bad = TestSpark.tempDir("scalechecks-ast-bad")
    spark.read.parquet(s"$outDir/graph_assortativity")
      .withColumn("assortativity", col("assortativity") + 0.001)
      .write.mode("overwrite").parquet(s"$bad/graph_assortativity")
    val (_, pass, _) = ScaleChecks.assortativityCheck(spark, sfDir, bad)
    assert(!pass)
  }

  test("linkpred_check canary: an adjacent pair smuggled in must fail") {
    val bad = TestSpark.tempDir("scalechecks-lp-bad")
    val d = spark.read.parquet(s"$outDir/graph_link_prediction")
    // replace the last dumped pair with a real edge (adjacent by
    // construction — exactly what the anti-join is contracted to drop)
    val edge = Graph.cooccurrenceEdges(spark, sfDir).limit(1)
      .select(col("a").as("u"), col("b").as("v"),
        lit(1L).as("common_neighbors"))
    d.orderBy(col("common_neighbors").desc, col("u"), col("v")).limit(19)
      .unionByName(edge)
      .write.mode("overwrite").parquet(s"$bad/graph_link_prediction")
    val (_, pass, detail) = ScaleChecks.linkpredCheck(spark, sfDir, bad)
    assert(!pass, detail.toString)
    assert(detail("adjacent_dumped") > 0)
  }
}
