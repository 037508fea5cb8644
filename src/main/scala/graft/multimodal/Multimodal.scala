package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal-column pipeline (north-star extension): media as opaque
  * `binary` payloads with typed metadata, decoded / frame-sampled /
  * feature-extracted through real Dataset plumbing.
  *
  * The DECODE ITSELF IS A STUB (this container has no image/audio codecs):
  * `decodeStub` derives dimensions deterministically from the payload
  * bytes. Everything around it — the binary column, the case-class
  * encoders, the mapPartitions batch shape, the frame explode, the
  * partitioning — is the real 100 TB design:
  *
  *  - payloads never pass through the driver; decode runs per partition
  *    (at scale: per executor, one codec context per partition, which is
  *    why mapPartitions and not map);
  *  - frames are exploded AFTER per-asset sampling, so shuffle volume is
  *    the sampled subset, not every frame;
  *  - metadata (width/height/frames) travels in columns so downstream
  *    filters prune without touching payload bytes (parquet column
  *    pruning keeps the binary column unread — at 100 TB that is the
  *    difference between scanning metadata and scanning everything).
  */
object Multimodal {

  case class MediaAsset(asset_id: Long, kind: String, lang: String,
    payload: Array[Byte])
  case class DecodedAsset(asset_id: Long, kind: String, lang: String,
    width: Int, height: Int, n_frames: Int, size_bytes: Long)
  case class Frame(asset_id: Long, kind: String, frame_idx: Int, luma: Double)

  /** Synthesize a media-asset table from documents: the text bytes stand in
    * for an encoded payload; kind cycles image/audio/video. Deterministic. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** ======================== STUB ========================
    * Stand-in for a real codec (libjpeg / ffmpeg / soundfile): derives
    * width/height/frame-count deterministically from payload bytes.
    * The signature and batch shape (Iterator → Iterator, one decoder
    * context per partition) are what a real decoder plugs into.
    * ====================================================== */
  def decodeStub(assets: Iterator[MediaAsset]): Iterator[DecodedAsset] = {
    // one "codec context" per partition would be initialized here
    assets.map { a =>
      val n = a.payload.length.toLong
      val first = if (n > 0) a.payload(0) & 0xffL else 0L
      val width = (64 + (n * 31 + first) % 1857).toInt
      val height = (64 + (n * 17 + first) % 1017).toInt
      val frames = math.min(8L, (n + 255) / 256).toInt // ceil(n/256) capped
      DecodedAsset(a.asset_id, a.kind, a.lang, width, height, frames, n)
    }
  }

  def decoded(spark: SparkSession, dir: String): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets(spark, dir).mapPartitions(decodeStub)
  }

  /** Frame sampling: every `step`-th frame index, with a stubbed per-frame
    * luma statistic from the corresponding payload slice. Sampling happens
    * before the explode so only kept frames materialize. */
  def sampledFrames(spark: SparkSession, dir: String, step: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    assets(spark, dir).mapPartitions { it =>
      it.flatMap { a =>
        val n = a.payload.length
        val frames = math.min(8, (n + 255) / 256)
        (0 until frames by step).iterator.map { idx =>
          val lo = idx * 256
          val hi = math.min(n, lo + 256)
          val slice = a.payload.slice(lo, hi)
          val luma =
            if (slice.isEmpty) 0.0
            else slice.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / slice.length
          Frame(a.asset_id, a.kind, idx, luma)
        }
      }
    }
  }

  /** Per-kind decode statistics (oracle-checked: the stub arithmetic is
    * reproducible in SQL from n_chars, proving the mapPartitions plumbing
    * delivers exactly the declared per-row transform). */
  def decodeStats(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("width")).cast("long").as("sum_width"),
        (sum(col("width")).cast(DoubleType) / count(lit(1))).as("avg_width"),
        max(col("n_frames")).as("max_frames"),
        sum(col("size_bytes")).cast("long").as("total_bytes"))
      .orderBy(col("kind"))

  val decodeStatsSql: String =
    """WITH d AS (
      |  SELECT doc_id AS asset_id,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(64 + (n_chars * 31 + ascii(substr(text, 1, 1))) % 1857 AS INTEGER) AS width,
      |    CAST(least(8, (n_chars + 255) // 256) AS INTEGER) AS n_frames,
      |    n_chars AS size_bytes
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_assets,
      |  CAST(SUM(width) AS BIGINT) AS sum_width,
      |  CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width,
      |  MAX(n_frames) AS max_frames,
      |  CAST(SUM(size_bytes) AS BIGINT) AS total_bytes
      |FROM d GROUP BY kind ORDER BY kind""".stripMargin

  /** Sampled-frame inventory per asset (oracle-checked via the same
    * arithmetic: n_sampled = ceil(n_frames / step) with step=2). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    sampledFrames(spark, dir)
      .groupBy(col("asset_id"), col("kind"))
      .agg(count(lit(1)).as("n_sampled"),
        round(sum(col("luma")).cast(DoubleType) / count(lit(1)), 6).as("avg_luma"))
      .orderBy(col("asset_id"))

  val frameSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id AS asset_id,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(least(8, (n_chars + 255) // 256) AS INTEGER) AS n_frames,
      |    text
      |  FROM documents),
      |frames AS (
      |  SELECT asset_id, kind, CAST(2 * (i - 1) AS INTEGER) AS frame_idx,
      |    substr(text, 2 * (i - 1) * 256 + 1, 256) AS slice
      |  FROM d, range(1, 5) r(i)
      |  WHERE 2 * (i - 1) < n_frames),
      |luma AS (
      |  SELECT asset_id, kind, frame_idx,
      |    CAST(list_sum(list_transform(range(1, length(slice) + 1),
      |      j -> ascii(substr(slice, CAST(j AS INTEGER), 1)))) AS DOUBLE)
      |      / length(slice) AS luma
      |  FROM frames)
      |SELECT asset_id, kind, COUNT(*) AS n_sampled,
      |  round(CAST(SUM(luma) AS DOUBLE) / COUNT(*), 6) AS avg_luma
      |FROM luma GROUP BY asset_id, kind ORDER BY asset_id""".stripMargin
}
