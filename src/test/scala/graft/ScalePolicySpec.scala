package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the corpus-scaled capacity policies — each one
  * replaced a fixed constant that a 10×/100× ScaleGen run proved to be a
  * scale bug (r11: SCALE_r11.md). The POLICIES are the fix; these pins
  * keep them from silently regressing to constants. */
class ScalePolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ivfCellsFor scales as max(8, ceil(sqrt(N))) — fixed-nlist was quadratic probe cost") {
    assert(Similarity.ivfCellsFor(0) === 8)
    assert(Similarity.ivfCellsFor(64) === 8)
    assert(Similarity.ivfCellsFor(2000) === 45)    // sf0.1 embeddings
    assert(Similarity.ivfCellsFor(20000) === 142)  // sf1
    assert(Similarity.ivfCellsFor(200000) === 448) // sf10
    // perfect square: ceil(sqrt) must not round up past the root
    assert(Similarity.ivfCellsFor(10000) === 100)
  }

  test("ivfCellsFor matches its DuckDB oracle twin expression on the same counts") {
    // ivfCellsSqlK is GREATEST(8, CAST(ceil(sqrt(count)) AS BIGINT)) —
    // re-evaluate the same arithmetic the SQL twin runs and require
    // agreement at every count the testdata scales hit (plus the
    // boundary region around a perfect square, where an IEEE sqrt
    // discrepancy would first show)
    for (n <- Seq(1L, 63L, 64L, 65L, 1999L, 2000L, 9999L, 10000L, 10001L,
        20000L, 199999L, 200000L, 4000000L)) {
      val sqlTwin = math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong)
      assert(Similarity.ivfCellsFor(n).toLong === sqlTwin, s"n=$n")
    }
  }

  test("simhashCap scales with the corpus — fixed cap dropped organic buckets at sf1") {
    import spark.implicits._
    def docsOf(n: Int) =
      (0 until n).map(i => (i.toLong, "t")).toDF("doc_id", "text")
    assert(Dedup.simhashCap(docsOf(100)) === 1000)   // floor rules small corpora
    assert(Dedup.simhashCap(docsOf(5000)) === 1000)  // sf0.1: unchanged by the fix
    assert(Dedup.simhashCap(docsOf(10000)) === 2000) // growth is N/5 past the floor
  }

  test("co-occurrence bucket cap scales with users — fixed cap emptied the graph tier at sf1") {
    assert(Graph.maxBucketUsers(100) === 40L)    // floor rules small populations
    assert(Graph.maxBucketUsers(400) === 40L)
    assert(Graph.maxBucketUsers(1500) === 150L)  // sf0.1 events
    assert(Graph.maxBucketUsers(15000) === 1500L) // sf1: old fixed 40 dropped every bucket
    assert(Graph.maxBucketUsers(150000) === 15000L)
  }

  test("topk-sketch capacity covers the generator vocabulary 4x — the exactness contract") {
    // capacity-literal audit (r13): topkSketch's exact-oracle claim
    // requires vocab ≤ capacity. The testdata generator draws text from
    // a CLOSED token set (31 tokens at every SF), so the 128-counter
    // literal cannot saturate on this data — but that is a property of
    // the generator, so pin it: if a future testdata generation opens
    // the vocabulary past capacity/4, this fails with the contract
    // spelled out instead of the oracle diverging mysteriously.
    import org.apache.spark.sql.functions._
    val vocab = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(vocab * 4 <= TextAnalysis.TopkSketchCapacity,
      s"vocabulary $vocab outgrew capacity ${TextAnalysis.TopkSketchCapacity}" +
        " / 4 — topkSketch's exact-oracle contract no longer holds")
  }

  test("bloom runtime-filter bits scale with dim keys (see BloomJoinSpec for the curve)") {
    // cross-reference pin: the sizing function lives with the operator
    // and its regime tests in BloomJoinSpec; here assert only the audit
    // property — MORE keys never get FEWER bits (monotone, no silent cap
    // below the broadcast fence)
    val pts = Seq(0L, 10000L, 100000L, 1000000L, 10000000L)
    val bits = pts.map(graft.ops.RuntimeFilter.bloomBitsFor)
    assert(bits === bits.sorted, s"bloom sizing not monotone: $bits")
    assert(bits.last === (1 << 27) ||
      bits.last >= 10L * pts.last, "neither linear nor capped at the fence")
  }
}
