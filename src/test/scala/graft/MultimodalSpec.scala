package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL JDK codec round-trips sample/pixel-exactly against their
  * generating formulas — the property the DuckDB oracle re-derives
  * arithmetically at the inventory level. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("WAV round-trip is sample-exact: decoded stats equal the formula") {
    import spark.implicits._
    val decoded = Multimodal.audioAssets(spark, dir)
      .mapPartitions(Multimodal.decodeAudio)
      .filter(_.asset_id < 20).collect().sortBy(_.asset_id)
    assert(decoded.length === 20)
    decoded.foreach { d =>
      val n = 64 + (d.asset_id % 256).toInt
      val expectedSum = (0 until n).map { i =>
        math.abs(((d.asset_id * 31 + 7L * i) % 65536) - 32768)
      }.sum
      assert(d.sample_rate === 8000)
      assert(d.n_samples === n.toLong, s"asset ${d.asset_id}")
      assert(d.sum_abs === expectedSum, s"asset ${d.asset_id}")
    }
  }

  test("audio framing: per-frame energies re-derive from the formula; totals agree with decode") {
    import spark.implicits._
    val framed = Multimodal.audioAssets(spark, dir)
      .mapPartitions(Multimodal.decodeAudioFrames)
      .filter(_.asset_id < 20).collect().sortBy(_.asset_id)
    assert(framed.length === 20)
    framed.foreach { f =>
      val n = (64 + (f.asset_id % 256)).toInt
      def amp(i: Int) = math.abs(((f.asset_id * 31 + 7L * i) % 65536) - 32768)
      val frames = (0 until n).grouped(80).map(_.map(amp).sum).toVector
      assert(f.n_samples === n.toLong)
      assert(f.n_frames === frames.length)
      assert(f.total_abs === frames.sum)
      val best = frames.zipWithIndex.maxBy { case (s, i) => (s, -i) }
      assert(f.loudest_frame === best._2, s"asset ${f.asset_id}")
      assert(f.loudest_abs === best._1)
    }
    // cross-check against the per-asset decode tier: framewise sums must
    // add up to the whole-asset sum
    val whole = Multimodal.audioAssets(spark, dir)
      .mapPartitions(Multimodal.decodeAudio)
      .filter(_.asset_id < 20).collect().sortBy(_.asset_id)
    framed.zip(whole).foreach { case (f, w) =>
      assert(f.total_abs === w.sum_abs, s"asset ${f.asset_id}")
    }
  }

  test("WAV payload is a parseable RIFF/WAVE container, not raw PCM") {
    val a = Multimodal.audioAssets(spark, dir).filter(_.asset_id == 3L)
      .collect().head
    assert(new String(a.wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(a.wav.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("PNG round-trip is pixel-exact for a sampled asset") {
    val asset = Multimodal.imageAssets(spark, dir).filter(_.asset_id == 5L)
      .collect().head
    val img = Multimodal.decodeImages(Iterator(asset)).next()
    val (w, h) = (16 + (5 % 32), 16 + ((5 * 7) % 32))
    assert(img.width === w && img.height === h)
    val expected = (for { y <- 0 until h; x <- 0 until w }
      yield (5L * 31 + 7 * x + 13 * y) % 256).sum
    assert(img.luma_sum === expected)
  }

  test("video demux + per-frame PNG decode is pixel-exact for a sampled asset") {
    val id = 7L
    val asset = Multimodal.videoAssets(spark, dir).filter(_.asset_id == id)
      .collect().head
    val v = Multimodal.decodeVideos(Iterator(asset)).next()
    val nf = 2 + (id % 4).toInt
    val (w, h) = (8 + (id % 8).toInt, 8 + ((id * 5) % 8).toInt)
    assert(v.n_frames === nf && v.width === w && v.height === h)
    def frameSum(f: Int): Long = (for { y <- 0 until h; x <- 0 until w }
      yield (id * 31 + 11 * f + 7 * x + 13 * y) % 256).sum
    assert(v.first_sum === frameSum(0))
    assert(v.last_sum === frameSum(nf - 1))
    assert(v.luma_sum === (0 until nf).map(frameSum).sum)
  }

  test("video container framing rejects corrupt payloads loudly") {
    val asset = Multimodal.videoAssets(spark, dir).filter(_.asset_id == 3L)
      .collect().head
    val corrupt = asset.mjpng.clone()
    corrupt(0) = 0x7f.toByte // absurd frame count
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideos(Iterator(asset.copy(mjpng = corrupt))).next()
    }
  }
}
