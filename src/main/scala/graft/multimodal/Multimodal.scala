package graft.multimodal

import graft.Tables
import graft.ops.SmallSortOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal-column pipeline (north-star extension): media as opaque
  * `binary` payloads with typed metadata, decoded / frame-sampled /
  * feature-extracted through real Dataset plumbing.
  *
  * The IMAGE path decodes for real: `imageDecode` round-trips
  * deterministic grayscale PNGs through the JDK's `javax.imageio` codec
  * inside the mapPartitions slot, oracle-verified pixel-exactly. The
  * AUDIO path decodes for real too: `audioDecode` round-trips 16-bit PCM
  * through the JDK's `javax.sound.sampled` WAV codec, oracle-verified
  * sample-exactly. The VIDEO path decodes for real as well:
  * `videoDecode` demuxes a length-prefixed concatenated-PNG container
  * (the MJPEG idea with the JDK still codec as frame codec) and decodes
  * every frame with `ImageIO.read`, oracle-verified pixel-exactly.
  * `decodeStub` remains only as the documented plug-in shape for
  * external codecs (ffmpeg/soundfile) this container does not ship.
  * Everything around these — the binary column, the case-class
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
      .sortSmall(col("kind"))

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

  case class ImageAsset(asset_id: Long, png: Array[Byte])
  case class DecodedImage(asset_id: Long, width: Int, height: Int, luma_sum: Long)

  /** REAL image decode (no stub): deterministic grayscale PNGs are
    * encoded per partition with `javax.imageio` (the JDK's PNG codec),
    * carried as a binary column, and decoded back with `ImageIO.read` in
    * the same Iterator→Iterator mapPartitions slot `decodeStub`
    * documents. PNG is lossless for 8-bit gray, so the decoded pixels
    * equal the generating formula
    * `(asset_id·31 + 7x + 13y) mod 256` — which the DuckDB oracle
    * re-derives arithmetically. This proves the multimodal plumbing with
    * an actual codec end-to-end; audio ([[audioDecode]]) and video
    * ([[videoDecode]]) plug the same shape with their own real codecs. */
  def imageAssets(spark: SparkSession, dir: String): Dataset[ImageAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id")).as[Long]
      // explicit width: the source is one parquet split, and the codec
      // loop below is the hot CPU path — same rationale as hashedShingles
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // one encoder context per partition; disable ImageIO's disk cache
        // or every encode/decode spills through a temp file
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = 16 + (id % 32).toInt
          val h = 16 + ((id * 7) % 32).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id * 31 + 7 * x + 13 * y) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImageAsset(id, bos.toByteArray)
        }
      }
  }

  def decodeImages(assets: Iterator[ImageAsset]): Iterator[DecodedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    assets.map { a =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.png))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      DecodedImage(a.asset_id, w, h, sum)
    }
  }

  /** Per-asset decode results from the real PNG round-trip (rounding via
    * Spark's `round`, the cross-engine-proven path). */
  def imageDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageAssets(spark, dir).mapPartitions(decodeImages)
      .toDF()
      .select(col("asset_id"), col("width"), col("height"),
        round(col("luma_sum").cast(DoubleType) /
          (col("width").cast(DoubleType) * col("height").cast(DoubleType)), 6)
          .as("mean_luma"))
      .orderBy(col("asset_id"))
  }

  val imageDecodeSql: String =
    """WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(16 + doc_id % 32 AS INTEGER) AS width,
      |    CAST(16 + (doc_id * 7) % 32 AS INTEGER) AS height
      |  FROM documents),
      |px AS (
      |  SELECT asset_id, width, height,
      |    (asset_id * 31 + 7 * x.i + 13 * y.i) % 256 AS v
      |  FROM dims, range(0, 48) x(i), range(0, 48) y(i)
      |  WHERE x.i < width AND y.i < height)
      |SELECT asset_id, width, height,
      |  round(CAST(SUM(v) AS DOUBLE) / (width * height), 6) AS mean_luma
      |FROM px GROUP BY asset_id, width, height
      |ORDER BY asset_id""".stripMargin

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

  /** Resize planning: integer output dims for a max-side-256 thumbnail,
    * aspect-preserved, downscale-only. This is the metadata-only stage a
    * media pipeline runs BEFORE any pixel work — it reads width/height
    * columns and never touches the payload (column pruning keeps the
    * binary bytes unread; at 100 TB that is two ints per asset instead of
    * the asset). Pure integer arithmetic (`div`), so the plan is
    * engine-portable and oracle-exact. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .selectExpr("asset_id", "kind", "width", "height",
        "cast(case when greatest(width, height) <= 256 then width " +
          "else greatest(1, (cast(width as bigint) * 256) div greatest(width, height)) " +
          "end as bigint) as out_w",
        "cast(case when greatest(width, height) <= 256 then height " +
          "else greatest(1, (cast(height as bigint) * 256) div greatest(width, height)) " +
          "end as bigint) as out_h")
      .orderBy(col("asset_id"))

  case class AudioAsset(asset_id: Long, wav: Array[Byte])
  case class DecodedAudio(asset_id: Long, sample_rate: Int, n_samples: Long,
    sum_abs: Long)

  /** The JDK WAV codec providers, resolved ONCE per JVM. The
    * `AudioSystem.write`/`getAudioInputStream` facades run a
    * ServiceLoader provider scan on EVERY call; under Spark's
    * MutableURLClassLoader (hundreds of jars on the scan path) that
    * lookup costs ~0.3 ms/call and dominated the decode queries
    * (~3.7 s of a 5 s query for 10k assets — measured; the codec work
    * itself is ~0.05 s across 32 threads). Same codec classes, same
    * bytes — only the per-row re-discovery is hoisted. */
  private object WavCodec {
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
    import scala.jdk.CollectionConverters._
    lazy val writer: AudioFileWriter =
      java.util.ServiceLoader.load(classOf[AudioFileWriter]).asScala
        .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException("no JDK WAVE writer"))
    lazy val reader: AudioFileReader = {
      // probe each provider on a 1-sample WAV built by the writer above
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](2)), fmt, 1L)
      val bos = new java.io.ByteArrayOutputStream()
      writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val probe = bos.toByteArray
      java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala
        .find { r =>
          try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe))
                true }
          catch { case _: Exception => false }
        }
        .getOrElse(throw new IllegalStateException("no JDK WAVE reader"))
    }
  }

  /** REAL audio decode (no stub): deterministic 16-bit mono PCM is encoded
    * to WAV per partition with `javax.sound.sampled` (the JDK's WAV codec),
    * carried as a binary column, and decoded back with
    * `AudioSystem.getAudioInputStream` in the same Iterator→Iterator
    * mapPartitions slot. PCM WAV is lossless, so the decoded samples equal
    * the generating formula `((asset_id·31 + 7i) mod 65536) − 32768` —
    * which the DuckDB oracle re-derives arithmetically. Image, audio and
    * video ([[videoDecode]]) all run actual JDK codecs end-to-end. */
  def audioAssets(spark: SparkSession, dir: String): Dataset[AudioAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id")).as[Long]
      // explicit width: the source is one parquet split, and the codec
      // loop below is the hot CPU path — same rationale as hashedShingles
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // one encoder format context per partition
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
        it.map { id =>
          val n = 64 + (id % 256).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = (((id * 31 + 7L * i) % 65536) - 32768).toInt
            pcm(2 * i) = (v & 0xff).toByte // little-endian
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          WavCodec.writer.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          AudioAsset(id, bos.toByteArray)
        }
      }
  }

  def decodeAudio(assets: Iterator[AudioAsset]): Iterator[DecodedAudio] =
    assets.map { a =>
      val ais = WavCodec.reader.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.wav))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var sumAbs = 0L
      var i = 0
      while (i < n) {
        // 16-bit signed little-endian reassembly
        val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        sumAbs += math.abs(v)
        i += 1
      }
      DecodedAudio(a.asset_id, fmt.getSampleRate.toInt, n.toLong, sumAbs)
    }

  case class AudioFrames(asset_id: Long, n_samples: Long, n_frames: Int,
    loudest_frame: Int, loudest_abs: Long, total_abs: Long)

  /** FEATURE EXTRACTION on the real decoded stream — the step after
    * decode in any audio pipeline (VAD, loudness normalization, segment
    * selection all start from framewise energy). Samples come out of the
    * actual `javax.sound.sampled` WAV codec, are framed at 80 samples
    * (10 ms at 8 kHz), and each frame's Σ|amplitude| reduces to the
    * per-asset loudest-frame summary INSIDE the decoder (mapPartitions —
    * frames never materialize as rows, so shuffle volume is one summary
    * row per asset regardless of duration; at 100 TB that is the
    * difference between shuffling summaries and shuffling audio). The
    * oracle re-derives every frame arithmetically from the synthesis
    * formula — so codec round-trip + framing + argmax are all checked
    * sample-exactly. */
  def decodeAudioFrames(assets: Iterator[AudioAsset]): Iterator[AudioFrames] =
    assets.map { a =>
      val ais = WavCodec.reader.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.wav))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val frameLen = 80
      val nFrames = (n + frameLen - 1) / frameLen
      var loudestFrame = 0
      var loudestAbs = -1L
      var totalAbs = 0L
      var f = 0
      while (f < nFrames) {
        var s = 0L
        var i = f * frameLen
        val end = math.min(n, i + frameLen)
        while (i < end) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          s += math.abs(v)
          i += 1
        }
        // strictly-greater keeps the LOWEST index on ties, matching the
        // oracle's (abs DESC, frame_idx ASC) row_number
        if (s > loudestAbs) { loudestAbs = s; loudestFrame = f }
        totalAbs += s
        f += 1
      }
      AudioFrames(a.asset_id, n.toLong, nFrames, loudestFrame, loudestAbs, totalAbs)
    }

  def audioFraming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioAssets(spark, dir).mapPartitions(decodeAudioFrames)
      .toDF()
      .orderBy(col("asset_id"))
  }

  val audioFramingSql: String =
    """WITH d AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(64 + doc_id % 256 AS BIGINT) AS n
      |  FROM documents),
      |fr AS (
      |  SELECT asset_id, n, r.i // 80 AS frame_idx,
      |    SUM(ABS((asset_id * 31 + 7 * r.i) % 65536 - 32768)) AS s
      |  FROM d, range(0, 320) r(i)
      |  WHERE r.i < n GROUP BY 1, 2, 3),
      |rk AS (
      |  SELECT asset_id, n, frame_idx, s,
      |    ROW_NUMBER() OVER (PARTITION BY asset_id
      |                       ORDER BY s DESC, frame_idx) AS rn,
      |    COUNT(*) OVER (PARTITION BY asset_id) AS n_frames,
      |    SUM(s) OVER (PARTITION BY asset_id) AS tot
      |  FROM fr)
      |SELECT asset_id, n AS n_samples, CAST(n_frames AS INTEGER) AS n_frames,
      |  CAST(frame_idx AS INTEGER) AS loudest_frame,
      |  CAST(s AS BIGINT) AS loudest_abs, CAST(tot AS BIGINT) AS total_abs
      |FROM rk WHERE rn = 1 ORDER BY asset_id""".stripMargin

  /** Per-asset decode results from the real WAV round-trip: the decoded
    * header must carry the encoded sample rate, the frame count must match
    * the formula, and the mean |amplitude| must equal the oracle's
    * arithmetic re-derivation sample-exactly. */
  def audioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioAssets(spark, dir).mapPartitions(decodeAudio)
      .toDF()
      .select(col("asset_id"), col("sample_rate"), col("n_samples"),
        round(col("sum_abs").cast(DoubleType) / col("n_samples").cast(DoubleType), 6)
          .as("mean_abs"))
      .orderBy(col("asset_id"))
  }

  val audioDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(64 + doc_id % 256 AS BIGINT) AS n
      |  FROM documents),
      |s AS (
      |  SELECT asset_id, n,
      |    ABS((asset_id * 31 + 7 * r.i) % 65536 - 32768) AS a
      |  FROM d, range(0, 320) r(i)
      |  WHERE r.i < n)
      |SELECT asset_id, CAST(8000 AS INTEGER) AS sample_rate,
      |  n AS n_samples,
      |  round(CAST(SUM(a) AS DOUBLE) / n, 6) AS mean_abs
      |FROM s GROUP BY asset_id, n ORDER BY asset_id""".stripMargin

  val resizePlanSql: String =
    """WITH d AS (
      |  SELECT doc_id AS asset_id,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(64 + (n_chars * 31 + ascii(substr(text, 1, 1))) % 1857 AS INTEGER) AS width,
      |    CAST(64 + (n_chars * 17 + ascii(substr(text, 1, 1))) % 1017 AS INTEGER) AS height
      |  FROM documents)
      |SELECT asset_id, kind, width, height,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN width
      |       ELSE greatest(1, (CAST(width AS BIGINT) * 256) // greatest(width, height))
      |       END AS BIGINT) AS out_w,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN height
      |       ELSE greatest(1, (CAST(height AS BIGINT) * 256) // greatest(width, height))
      |       END AS BIGINT) AS out_h
      |FROM d ORDER BY asset_id""".stripMargin

  case class PHash(doc_id: Long, simhash: Long)

  /** 64-bit average-hash (aHash — the pHash-family baseline popularized by
    * Krawetz, "Looks Like It", 2011) from the REAL decoded pixels: the image
    * is partitioned into an 8×8 block grid (pixel x → block x·8 div w, so
    * every block is non-empty for w,h ≥ 8), and bit (by·8+bx) is set iff
    * that block's mean EXCEEDS the global mean — compared by integer
    * cross-multiplication (`bsum·npix > total·bn`), so the signature is
    * exact and the DuckDB oracle reproduces it from the generating
    * formula without ever touching a double. */
  private[graft] def phashes(assets: Iterator[ImageAsset]): Iterator[PHash] = {
    javax.imageio.ImageIO.setUseCache(false)
    assets.map { a =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.png))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bsum = new Array[Long](64)
      val bn = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val bit = by * 8 + x * 8 / w
          val v = raster.getSample(x, y, 0)
          bsum(bit) += v; bn(bit) += 1; total += v
          x += 1
        }
        y += 1
      }
      val npix = w.toLong * h
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (bsum(b) * npix > total * bn(b)) sig |= (1L << b)
        b += 1
      }
      PHash(a.asset_id, sig)
    }
  }

  /** Perceptual near-duplicate images: aHash signatures from the real PNG
    * decode, paired by the SAME Manku 4×16-bit block banding the text
    * simhash tier uses (complete for Hamming ≤ 3) — never an all-pairs
    * join; the DuckDB oracle re-derives every signature arithmetically
    * (HUGEINT bit assembly, exact integer mean comparison) and
    * brute-forces all pairs, independently cross-checking both the hash
    * and the blocking. The corpus genuinely contains duplicate images
    * (generator pattern repeats with asset_id period 256), so the output
    * is non-trivial at every SF. */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // Corpus-scaled hot-bucket cap, NOT a constant: the generator's
    // pattern space is id mod 256, so every distinct phash gains
    // corpus/256 exact copies as the corpus grows — at sf10 (500k docs,
    // ~1950 copies each) a fixed cap of 1000 dropped EVERY block bucket
    // and the query silently returned 0 pairs (found by the r14 scale
    // campaign; the same fixed-cap bug class r11 fixed for the text
    // simhash tier). max(1000, N/5) keeps every organic bucket while
    // still refusing saturation degeneracy, mirroring Dedup.simhashCap.
    val assets = imageAssets(spark, dir)
    val cap = phashCapFor(Tables.documents(spark, dir).count())
    val sigs = assets.mapPartitions(phashes).toDF()
    graft.ops.Dedup.hammingPairs(sigs, bucketCap = cap)
  }

  /** Corpus-scaled phash hot-bucket cap (class-b policy, CAP_AUDIT.md):
    * max(1000, N/5), Int-clamped like Dedup.minhashCapFor — N/5 past
    * ~10.7B docs would overflow toInt negative and null every bucket.
    * Pinned in ScalePolicySpec. */
  private[graft] def phashCapFor(n: Long): Int =
    math.max(1000L, math.min(n / 5, Int.MaxValue.toLong)).toInt

  val phashDedupSql: String =
    """WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(16 + doc_id % 32 AS INTEGER) AS width,
      |    CAST(16 + (doc_id * 7) % 32 AS INTEGER) AS height
      |  FROM documents),
      |px AS (
      |  SELECT asset_id, width, height,
      |    ((y.i * 8) // height) * 8 + (x.i * 8) // width AS bit,
      |    (asset_id * 31 + 7 * x.i + 13 * y.i) % 256 AS v
      |  FROM dims, range(0, 48) x(i), range(0, 48) y(i)
      |  WHERE x.i < width AND y.i < height),
      |blocks AS (
      |  SELECT asset_id, bit, SUM(v) AS bsum, COUNT(*) AS bn
      |  FROM px GROUP BY asset_id, bit),
      |tot AS (
      |  SELECT asset_id, SUM(v) AS total, COUNT(*) AS npix
      |  FROM px GROUP BY asset_id),
      |ph0 AS (
      |  SELECT b.asset_id,
      |    SUM(CASE WHEN b.bsum * t.npix > t.total * b.bn
      |             THEN CAST(power(2, b.bit) AS HUGEINT)
      |             ELSE CAST(0 AS HUGEINT) END) AS s
      |  FROM blocks b JOIN tot t USING (asset_id)
      |  GROUP BY b.asset_id),
      |ph AS (
      |  SELECT asset_id,
      |    CAST(CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT)
      |              THEN s - CAST(18446744073709551616 AS HUGEINT) ELSE s END
      |         AS BIGINT) AS sig
      |  FROM ph0)
      |SELECT a.asset_id AS d1, b.asset_id AS d2,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      |FROM ph a JOIN ph b ON a.asset_id < b.asset_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY d1, d2""".stripMargin

  case class VideoAsset(asset_id: Long, mjpng: Array[Byte])
  case class DecodedVideo(asset_id: Long, n_frames: Int, width: Int,
    height: Int, luma_sum: Long, first_sum: Long, last_sum: Long)

  /** REAL video decode (closing the last codec stub): the "video" is a
    * length-prefixed concatenated-PNG container — the MJPEG idea with the
    * JDK's own still codec as the frame codec. Layout:
    * `[int32 n_frames][int32 len, PNG bytes] × n_frames` (big-endian).
    * Every frame is a REAL `javax.imageio` encode on the write side and a
    * REAL `ImageIO.read` on the decode side, per partition, in the same
    * Iterator→Iterator slot as the image/audio paths; the container
    * framing is parsed with strict bounds checks (a real demuxer's job).
    * PNG is lossless for 8-bit gray, so decoded pixels equal the
    * generating formula `(id·31 + 11f + 7x + 13y) mod 256`, which the
    * DuckDB oracle re-derives arithmetically over (frame, x, y) — the
    * codec round-trip and the demuxer are both pinned end-to-end. With
    * this, image, audio AND video all run actual JDK codecs; `decodeStub`
    * stays only as the documented plug-in shape for external codecs
    * (ffmpeg etc.) this container does not ship. */
  def videoAssets(spark: SparkSession, dir: String): Dataset[VideoAsset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id")).as[Long]
      // explicit width: single parquet split in, codec loop is the hot path
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val nf = 2 + (id % 4).toInt
          val w = 8 + (id % 8).toInt
          val h = 8 + ((id * 5) % 8).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(bos)
          dos.writeInt(nf)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  ((id * 31 + 11 * f + 7 * x + 13 * y) % 256).toInt)
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            val bytes = fb.toByteArray
            dos.writeInt(bytes.length)
            dos.write(bytes)
            f += 1
          }
          VideoAsset(id, bos.toByteArray)
        }
      }
  }

  def decodeVideos(assets: Iterator[VideoAsset]): Iterator[DecodedVideo] = {
    javax.imageio.ImageIO.setUseCache(false)
    assets.map { a =>
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(a.mjpng))
      val nf = in.readInt()
      require(nf >= 0 && nf <= (1 << 16), s"asset ${a.asset_id}: bad frame count $nf")
      var total = 0L; var first = 0L; var last = 0L
      var w = 0; var h = 0
      var f = 0
      while (f < nf) {
        val len = in.readInt()
        require(len > 0 && len <= a.mjpng.length,
          s"asset ${a.asset_id}: bad frame length $len")
        val buf = new Array[Byte](len)
        in.readFully(buf)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(buf))
        w = img.getWidth; h = img.getHeight
        val raster = img.getRaster
        var fsum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { fsum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        total += fsum
        if (f == 0) first = fsum
        if (f == nf - 1) last = fsum
        f += 1
      }
      DecodedVideo(a.asset_id, nf, w, h, total, first, last)
    }
  }

  /** Per-asset decode results from the real demux + PNG round-trip. */
  def videoDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoAssets(spark, dir).mapPartitions(decodeVideos)
      .toDF()
      .select(col("asset_id"), col("n_frames"), col("width"), col("height"),
        round(col("luma_sum").cast(DoubleType) /
          (col("n_frames") * col("width") * col("height")).cast(DoubleType), 6)
          .as("mean_luma"),
        round(col("first_sum").cast(DoubleType) /
          (col("width") * col("height")).cast(DoubleType), 6)
          .as("first_frame_luma"),
        round(col("last_sum").cast(DoubleType) /
          (col("width") * col("height")).cast(DoubleType), 6)
          .as("last_frame_luma"))
      .orderBy(col("asset_id"))
  }

  val videoDecodeSql: String =
    """WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |    CAST(2 + doc_id % 4 AS INTEGER) AS n_frames,
      |    CAST(8 + doc_id % 8 AS INTEGER) AS width,
      |    CAST(8 + (doc_id * 5) % 8 AS INTEGER) AS height
      |  FROM documents),
      |px AS (
      |  SELECT asset_id, n_frames, width, height, f.i AS f,
      |    (asset_id * 31 + 11 * f.i + 7 * x.i + 13 * y.i) % 256 AS v
      |  FROM dims, range(0, 6) f(i), range(0, 16) x(i), range(0, 16) y(i)
      |  WHERE f.i < n_frames AND x.i < width AND y.i < height)
      |SELECT asset_id, n_frames, width, height,
      |  round(CAST(SUM(v) AS DOUBLE) / (n_frames * width * height), 6) AS mean_luma,
      |  round(CAST(SUM(CASE WHEN f = 0 THEN v END) AS DOUBLE)
      |    / (width * height), 6) AS first_frame_luma,
      |  round(CAST(SUM(CASE WHEN f = n_frames - 1 THEN v END) AS DOUBLE)
      |    / (width * height), 6) AS last_frame_luma
      |FROM px GROUP BY asset_id, n_frames, width, height
      |ORDER BY asset_id""".stripMargin
}
