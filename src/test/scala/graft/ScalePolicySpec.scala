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

  test("co-occurrence bucket sample K grows as sqrt(users) — pair work stays linear") {
    // r13 policy: per-bucket SAMPLING (not drop-threshold) at
    // K = max(40, ceil(1.6*sqrt(users))). Total pre-edge pair volume
    // once buckets saturate is nBuckets * K^2/2, i.e. LINEAR in the
    // corpus; the r11 linear cap (users/10) made it QUADRATIC — 14.1e9
    // pre-edge pairs at sf10 timed the whole graph tier out — while a
    // drop-threshold tight enough to bound work kept 17/3600 buckets
    // (the r11 empty-graph degeneration). Pin the policy's three
    // regimes and the spec-SF invariance (largest sf0.1 bucket is 51
    // users < K=62, so spec-SF outputs are bit-identical to pre-r13).
    assert(Graph.bucketSampleK(100) === 40L)     // floor rules small populations
    assert(Graph.bucketSampleK(400) === 40L)
    assert(Graph.bucketSampleK(1500) === 62L)    // sf0.1 events: K > max bucket 51
    assert(Graph.bucketSampleK(15000) === 196L)  // sf1
    assert(Graph.bucketSampleK(150000) === 620L) // sf10: 3600*620^2/2 ~ 0.7e9 pairs
    val ks = Seq(1L, 1000L, 10000L, 1000000L, 100000000L).map(Graph.bucketSampleK)
    assert(ks === ks.sorted, s"sample K not monotone: $ks")
  }

  test("triangle wedge cap exceeds the spec-SF max out-degree — exactness contract") {
    // capacity-literal audit: triangleCount truncates each node's
    // degree-ordered out-adjacency at MaxWedgeDegree, which is EXACT
    // only while the spec graph's max out-degree stays below the cap
    // (measured 41 at sf0.1; the truncation is the documented
    // lower-bound posture on denser corpora). Pin the invariant the
    // exactness claim rests on, at the SF the correctness gate runs.
    import org.apache.spark.sql.functions._
    val q = graft.SparkEntry.queries("graph_triangle_count")
    q(spark, "/root/testdata/sf0.01").collect() // materializes the memo
    // re-derive the oriented out-degrees independently of the operator
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val users = ev.select(col("user_id")).distinct().count()
    val k = Graph.bucketSampleK(users)
    val occ = ev.select(col("event_type"),
        date_trunc("HOUR", col("ts")).as("hb"), col("user_id")).distinct()
    val smp = occ.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("hb"))
          .orderBy(pmod(col("user_id") % lit(999999937L) * lit(2654435761L),
            lit(999999937L)), col("user_id"))))
      .filter(col("rk") <= k).drop("rk")
    val edges = smp.as("x").join(smp.as("y"), Seq("event_type", "hb"))
      .filter(col("x.user_id") < col("y.user_id"))
      .groupBy(col("x.user_id").as("a"), col("y.user_id").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 4)
      .select(col("a"), col("b"))
    val deg = edges.select(col("a").as("n")).union(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val wd = edges
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val maxOut = wd.select(when(aFirst, col("a")).otherwise(col("b")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).collect()(0).getLong(0)
    assert(maxOut <= Graph.MaxWedgeDegree,
      s"spec-SF max out-degree $maxOut exceeds wedge cap " +
        s"${Graph.MaxWedgeDegree} — triangle counts are no longer exact " +
        "at the correctness gate's SF")
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

  test("semClusterCap scales as 4x mean cluster size — fixed 1000 crossed below MEAN size sqrt(N) at N~1e6") {
    // r17 fix: THIRD instance of the fixed-capacity class (simhash r11,
    // minhash bucket cap r16). With k = ceil(sqrt(N)) cells the mean
    // cluster is ~sqrt(N); a fixed 1000 guard would trip on TYPICAL
    // clusters past N ~ 1e6 and SemDeDup silently stops deduplicating
    // most of the corpus (twin-mirrored, so parity stays green — the
    // worst kind). Pin the three regimes + monotonicity + Int clamp.
    assert(Dedup.semClusterCap(0) === 1000)        // floor
    assert(Dedup.semClusterCap(20000) === 1000)    // sf1: mean 142, floor rules
    assert(Dedup.semClusterCap(200000) === 1788)   // sf10: 4*ceil(200000/448)=4*447
    assert(Dedup.semClusterCap(2000000) === 5656)  // sf100: 4*ceil(2e6/1415)
    val caps = Seq(1L, 20000L, 200000L, 2000000L, 200000000L, 20000000000L)
      .map(n => Dedup.semClusterCap(n).toLong)
    assert(caps === caps.sorted, s"semClusterCap not monotone: $caps")
    assert(Dedup.semClusterCap(Long.MaxValue / 2) > 0, "Int clamp must hold")
  }

  test("semClusterCap matches the DuckDB twin's HAVING bound on the same counts") {
    // the twin computes GREATEST(1000, 4 * ((N + k - 1) // k)) with
    // k = GREATEST(8, CAST(ceil(sqrt(N)) AS BIGINT)); re-evaluate that
    // arithmetic (DuckDB // is floor division = Long / on positives)
    // and require agreement across the regime INCLUDING counts where
    // the scaled branch wins — the driver's sf0.01 gate only ever
    // exercises the floor branch, so parity there proves nothing about
    // the formula.
    for (n <- Seq(1L, 999L, 20000L, 62499L, 62500L, 1000000L, 1999999L,
        2000000L, 100000000L)) {
      val k = math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong)
      val sqlTwin = math.max(1000L, 4L * ((n + k - 1) / k))
      assert(Dedup.semClusterCap(n).toLong === sqlTwin, s"n=$n")
    }
    // drift guard: the twin SQL must actually carry the scaled formula
    assert(Dedup.semanticSql.contains("GREATEST(1000,"),
      "semanticSql lost the corpus-scaled cluster-cap bound")
    assert(Dedup.semanticSql.contains("// GREATEST(8,"),
      "semanticSql lost the mean-cluster divisor")
  }

  test("lshPlanesFor scales the sign-LSH bucket space with the corpus — fixed 8 planes starves the ANN output past N~256k") {
    // r17 fix, FOURTH instance of the fixed-capacity class: 2^8 = 256
    // buckets forever meant mean occupancy N/256 crossed the 1000-member
    // hot-bucket guard at N ~ 256k — on occupancy-typical data every
    // organic bucket is then excluded and annLshBucketed/knnGraphClusters
    // return empty neighbor sets (twin-mirrored, parity green); on the
    // sign-degenerate synthetic corpus the measured effect is partial
    // (SCALE_r17 census: 43% more vectors paired at sf100 under the
    // scaled count). Policy: smallest p with 2^p >= ceil(N/500),
    // floored at 8 — gate SFs unchanged.
    assert(Similarity.lshPlanesFor(0) === 8)
    assert(Similarity.lshPlanesFor(2000) === 8)     // sf0.1: unchanged
    assert(Similarity.lshPlanesFor(128000) === 8)   // 2^8 = 256 >= ceil(128000/500)
    assert(Similarity.lshPlanesFor(128001) === 9)   // first count needing 9
    assert(Similarity.lshPlanesFor(200000) === 9)   // sf10: 512 buckets, occ ~390
    assert(Similarity.lshPlanesFor(2000000) === 12) // sf100: 4096 buckets, occ ~490
    val ps = Seq(1L, 2000L, 200000L, 2000000L, 200000000L, Long.MaxValue / 2)
      .map(n => Similarity.lshPlanesFor(n).toLong)
    assert(ps === ps.sorted, s"plane count not monotone: $ps")
  }

  test("lshPlanesFor matches the DuckDB twin's integer formula on the same counts") {
    // twin: GREATEST(8, LENGTH(bin((N + 499) // 500 - 1))) — bit width
    // of ceil(N/500) - 1, exact integer arithmetic in both engines (no
    // IEEE log2 boundary risk). Re-evaluate DuckDB's semantics here:
    // LENGTH(bin(x)) of a non-negative BIGINT is max(1, bitWidth(x)).
    for (n <- Seq(1L, 499L, 500L, 501L, 127999L, 128000L, 128001L,
        200000L, 1999999L, 2000000L, 2048000L, 2048001L, 100000000L)) {
      val m = (n + 499) / 500
      val binLen =
        if (m - 1 <= 0) 1
        else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
      val sqlTwin = if (m <= 1) 8L else math.max(8L, binLen.toLong)
      assert(Similarity.lshPlanesFor(n).toLong === sqlTwin, s"n=$n")
    }
    // drift guards: both consuming twins must carry the scaled formula
    assert(Similarity.annLshBucketedSql.contains("LENGTH(bin("),
      "annLshBucketedSql lost the corpus-scaled plane count")
    assert(Similarity.knnGraphClustersSql.contains("LENGTH(bin("),
      "knnGraphClustersSql lost the corpus-scaled plane count")
  }

  test("minhash/simhash cap policies clamp to Int.MaxValue past ~10.7B docs") {
    // ADVICE r16: (n/5).toInt silently overflowed negative for n > ~10.7B
    // — a negative cap nulls EVERY bucket (zero candidates, oracle-green
    // at any testable SF). Pin the clamp and the scaling regime.
    assert(Dedup.minhashCapFor(100) === 100)              // eval floor
    assert(Dedup.minhashCapFor(10000) === 2000)           // N/5 past floor
    assert(Dedup.minhashCapFor(20000000000L) === Int.MaxValue)
    assert(Dedup.simhashCapFor(100) === 1000)             // signature floor
    assert(Dedup.simhashCapFor(10000) === 2000)
    assert(Dedup.simhashCapFor(20000000000L) === Int.MaxValue)
    // phash dedup shares the regime (r14 fix, named + pinned r18)
    assert(graft.multimodal.Multimodal.phashCapFor(100) === 1000)
    assert(graft.multimodal.Multimodal.phashCapFor(10000) === 2000)
    assert(graft.multimodal.Multimodal.phashCapFor(20000000000L) === Int.MaxValue)
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
