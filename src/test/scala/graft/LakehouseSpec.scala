package graft

import graft.ops.Lakehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property guards for the lakehouse-maintenance shapes (value-level
  * equality with DuckDB is the driver gate; these pin the semantics and
  * the physical clustering property). */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("merge routes every changeset row and only those (action census)") {
    import spark.implicits._
    val out = Lakehouse.mergeUpsert(spark, dir)
      .groupBy($"action").count().as[(String, Long)].collect().toMap
    val keys = Tables.orders(spark, dir)
      .select($"o_orderkey").as[Long].collect().toSet
    def n(p: Long => Boolean) = keys.count(p).toLong
    // updates: base keys ≡0 (mod 10) that survive the output sample (mod 7)
    assert(out.getOrElse("update", 0L) === n(k => k % 10 == 0 && k % 7 == 0))
    // inserts: keys ≡3 (mod 17), sampled on the SHIFTED key
    assert(out.getOrElse("insert", 0L) ===
      n(k => k % 17 == 3 && (k + 100000000L) % 7 == 0))
    assert(out.getOrElse("carry", 0L) ===
      n(k => k % 7 == 0 && k % 10 != 0))
  }

  test("scd2 versions tile each user's history: ranges abut, one current") {
    import spark.implicits._
    val rows = Lakehouse.scd2UserStatus(spark, dir)
      .select($"user_id", $"effective_from".cast("string"),
        $"effective_to".cast("string"), $"is_current")
      .as[(Long, String, Option[String], Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._4) === 1, s"user $u")
      assert(sorted.last._4, s"user $u: current version must be last")
      // each version's effective_to equals the next version's effective_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"user $u: gap/overlap")
        case _ => ()
      }
    }
  }

  test("z-order clustered write bounds per-file spans on BOTH dims") {
    import spark.implicits._
    // Full 128×128 grid so both dims exercise their whole range: a
    // single-column sort would give per-file span 127 on the other dim;
    // z-order must bound BOTH well below that.
    val grid = spark.range(128L * 128L)
      .select(($"id" % 128).as("l_partkey"), expr("id div 128").as("l_suppkey"))
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      Lakehouse.zorderClusteredWrite(grid, 16).write
        .mode("overwrite").parquet(out)
      val spans = spark.read.parquet(out)
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg((max($"p") - min($"p")).as("ps"), (max($"s") - min($"s")).as("ss"))
        .select($"ps", $"ss").as[(Long, Long)].collect()
      assert(spans.length >= 8, "range partitioner should produce many files")
      // 16 z-range files over a 14-bit z space ⇒ each covers ~2^10 of z =
      // a 32×32 box (plus one boundary box per file edge); 64 is a loose
      // 2× allowance over the ideal, far under the unclustered 127.
      val (pAvg, sAvg) = (spans.map(_._1).sum / spans.length,
        spans.map(_._2).sum / spans.length)
      assert(pAvg <= 64, s"avg p-span $pAvg: files not p-local")
      assert(sAvg <= 64, s"avg s-span $sAvg: files not s-local")
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(new java.io.File(out))
    }
  }

  test("morton2 interleaves bits exactly (vs bit-by-bit reference)") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (12345L, 54321L), (1L, 2L), (43690L, 21845L))
    val got = cases.toDF("a", "b")
      .select(Lakehouse.morton2(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === cases.map { case (a, b) => ref(a, b) })
  }
}
