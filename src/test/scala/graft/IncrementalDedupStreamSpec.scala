package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the incremental-dedup tier (`dedup_incremental`):
  * documents arrive in micro-batches, each batch is screened against the
  * block index MAINTAINED from all earlier batches, and the batch's own
  * blocks are then merged into the index — the daily-ingest loop run as a
  * `foreachBatch` stream. After streaming the corpus in three arrival
  * chunks, the accumulated matches must equal the one-shot batch screen
  * under the same strict arrival-prefix semantics.
  *
  * The banding here is the Manku 4×16 split with hamming cutoff 3:
  * by pigeonhole a pair within hamming ≤ 3 MUST share at least one of 4
  * blocks, so the batch twin is computed WITHOUT banding (plain all-pairs
  * across chunks) — exact agreement therefore also re-proves the block
  * screen is lossless at this cutoff, in the streaming shape. */
class IncrementalDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val MaxHamming = 3

  test("foreachBatch block-index maintenance equals the prefix-ordered batch screen") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("graft_simhash64(split(text, ' '))").as("sim"))
      .withColumn("chunk", pmod(col("doc_id"), lit(3L)))
      .persist()
    try {
      val streamDir = java.nio.file.Files.createTempDirectory("dedup_stream_src")
      val ckpt = java.nio.file.Files.createTempDirectory("dedup_stream_ckpt")
      val stateRoot = java.nio.file.Files.createTempDirectory("dedup_stream_state")
      // three arrival chunks, one file each; mtimes are STAMPED strictly
      // increasing (not slept for) so the file source's timestamp order
      // equals arrival order even on coarse-mtime filesystems or under
      // clock skew — freshly written files carry a real (large) mtime,
      // already-stamped ones carry a tiny one, which is how new files are
      // told apart below
      val stampBase = 1000000L
      (0L to 2L).foreach { c =>
        docs.filter(col("chunk") === c).select(col("doc_id"), col("sim"))
          .coalesce(1).write.mode("append").parquet(streamDir.toString)
        val t = java.nio.file.attribute.FileTime.fromMillis(stampBase * (c + 1))
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(streamDir).iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("part-"))
          .filter(p => java.nio.file.Files.getLastModifiedTime(p).toMillis > stampBase * 4)
          .foreach(p => java.nio.file.Files.setLastModifiedTime(p, t))
      }

      // the ENGINE's own block expansion (one shared definition of the
      // banding) — the spec must screen with exactly the banding the
      // engine runs, or it tests a different algorithm
      def blocksOf(df: DataFrame): DataFrame =
        graft.ops.Dedup.simhashBlockRows(df, "sim")

      val indexRef = new java.util.concurrent.atomic.AtomicReference[String](null)
      val pairsRef = new java.util.concurrent.atomic.AtomicReference[String](null)
      val version = new java.util.concurrent.atomic.AtomicInteger(0)
      def screenAndMerge(batch: DataFrame, id: Long): Unit = {
        val s = batch.sparkSession
        val newB = blocksOf(batch)
        val v = version.incrementAndGet()
        Option(indexRef.get()).foreach { idx =>
          val oldB = s.read.parquet(idx)
          val matches = oldB.as("o").join(newB.as("n"), Seq("blk", "bits"))
            .filter(expr("bit_count(o.sim ^ n.sim)") <= MaxHamming)
            .select(col("n.doc_id").as("new_doc"),
              struct(expr("cast(bit_count(o.sim ^ n.sim) as bigint)").as("h"),
                col("o.doc_id").as("d")).as("cand"))
            .groupBy(col("new_doc"))
            .agg(min(col("cand")).as("best"))
            .select(col("new_doc"), col("best.d").as("dup_of"),
              col("best.h").as("hamming"))
          val prevPairs = Option(pairsRef.get()).map(s.read.parquet(_))
          val allPairs = prevPairs.map(_.unionByName(matches)).getOrElse(matches)
          val pairsPath = s"$stateRoot/pairs_v$v"
          allPairs.write.mode("overwrite").parquet(pairsPath)
          pairsRef.set(pairsPath)
        }
        val merged = Option(indexRef.get())
          .map(idx => s.read.parquet(idx).unionByName(newB)).getOrElse(newB)
        val idxPath = s"$stateRoot/index_v$v"
        merged.write.mode("overwrite").parquet(idxPath)
        indexRef.set(idxPath)
      }

      val sch = docs.select(col("doc_id"), col("sim")).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
        .writeStream
        .foreachBatch(screenAndMerge _)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(180000), "dedup stream did not finish")
      finally q.stop()
      assert(version.get() === 3, s"expected 3 micro-batches, got ${version.get()}")

      // Batch twin: strict arrival-prefix screen, NO banding — all pairs
      // across earlier chunks within the hamming cutoff, best per new doc.
      val batchTwin = docs.as("o").join(docs.as("n"),
          col("o.chunk") < col("n.chunk") &&
            expr("bit_count(o.sim ^ n.sim)") <= MaxHamming)
        .select(col("n.doc_id").as("new_doc"),
          struct(expr("cast(bit_count(o.sim ^ n.sim) as bigint)").as("h"),
            col("o.doc_id").as("d")).as("cand"))
        .groupBy(col("new_doc"))
        .agg(min(col("cand")).as("best"))
        .select(col("new_doc"), col("best.d").as("dup_of"),
          col("best.h").as("hamming"))

      val streamed = spark.read.parquet(pairsRef.get())
      assert(streamed.count() > 0, "expected near-dups across arrival chunks")
      assert(streamed.exceptAll(batchTwin).count() === 0L)
      assert(batchTwin.exceptAll(streamed).count() === 0L)
    } finally docs.unpersist()
  }
}
