package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial guards for the dedup tiers: degenerate inputs must not
  * re-create the O(n²) blowup LSH exists to avoid, and the candidate
  * joins must stay equi-joins (no cartesian anywhere in the plan). */
class DedupGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def noCartesian(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    val bad = plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"$what must pair candidates via equi-joins, found: $bad")
  }

  test("simhash candidate pairing has no cartesian/nested-loop join") {
    noCartesian(Dedup.simhash(spark, dir), "simhash")
  }

  test("minhash candidate pairing has no cartesian/nested-loop join") {
    noCartesian(Dedup.minhashLsh(spark, dir), "minhashLsh")
  }

  test("banding recall sweep is nested-monotone with constant truth") {
    import spark.implicits._
    val rows = Dedup.bandingRecallEval(spark, dir)
      .select("bands", "rows_per_band", "n_truth", "n_recalled",
        "recall_fp", "cand_pairs")
      .as[(Int, Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq === Seq((8, 8), (16, 4), (32, 2)))
    assert(rows.map(_._3).distinct.length === 1, "truth set must not vary")
    assert(rows.head._3 > 0, "need a non-empty ground truth")
    rows.foreach { r =>
      assert(r._4 <= r._3)
      assert(r._5 === r._4 * 1000000L / r._3)
    }
    // aligned band slices nest: wider bands can only LOSE candidates
    rows.sliding(2).foreach { case Array(strict, lenient) =>
      assert(lenient._6 >= strict._6,
        s"candidates shrank widening ${strict._1}->${lenient._1} bands")
      assert(lenient._4 >= strict._4,
        s"recall shrank widening ${strict._1}->${lenient._1} bands")
    }
  }

  test("semantic dedup pairing has no cartesian/nested-loop join") {
    noCartesian(Dedup.semantic(spark, dir), "semantic")
  }

  test("semantic dedup keep rule: dup_of is an earlier same-cluster member") {
    val rows = Dedup.semantic(spark, dir).collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length,
      s"expected a non-vacuous split, got $kept/${rows.length} kept")
    val cidOf = rows.map(r => r.getLong(1) -> r.getInt(0)).toMap
    rows.foreach { r =>
      if (r.getBoolean(3)) assert(r.isNullAt(2), s"kept row carries dup_of: $r")
      else {
        val v = r.getLong(1); val d = r.getLong(2)
        assert(d < v, s"dup_of must be a lower id: $r")
        assert(cidOf(d) === cidOf(v), s"dup_of must share the cluster: $r")
      }
    }
  }

  test("connected components on an empty pair table returns empty, not NPE (all paths)") {
    import spark.implicits._
    // Zero near-dup pairs (sum over empty → NULL) must converge to an
    // empty result on round 1 instead of NPE-ing in the convergence check.
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.unionFindCC(empty).count() === 0L)
    assert(Dedup.labelPropagationCC(empty.localCheckpoint()).count() === 0L)
    assert(Dedup.starContractionCC(empty.localCheckpoint()).count() === 0L)
  }

  test("connected components merges a chain into one cluster (both paths agree)") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val expected = Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "canonical_id", "cluster_size")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(Dedup.unionFindCC(chain)) === expected)
    assert(run(Dedup.labelPropagationCC(chain.localCheckpoint())) === expected)
  }

  private def ccRun(df: DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.select("doc_id", "canonical_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("star contraction handles a diameter-119 chain that label propagation rejects") {
    import spark.implicits._
    // 120-node path graph: diameter 119 > labelPropagationCC's 50-round
    // cap (which must throw, not emit wrong labels); star contraction is
    // diameter-independent and must fold it into one cluster.
    val chain = (1L until 120L).map(i => (i, i + 1)).toDF("d1", "d2")
    val expected = (1L to 120L).map(i => (i, 1L, 120L))
    assert(ccRun(Dedup.starContractionCC(chain.localCheckpoint())) === expected)
    assert(ccRun(Dedup.unionFindCC(chain)) === expected)
    intercept[IllegalArgumentException] {
      Dedup.labelPropagationCC(chain.localCheckpoint()).count()
    }
  }

  test("star contraction agrees with union-find on star/random/multi-component graphs") {
    import spark.implicits._
    // hub-and-spoke (hub is NOT the min id), plus a seeded random graph
    // with several components, plus duplicate + reversed edges
    val star = (1L to 30L).filter(_ != 17L).map(i => (17L, i)).toDF("d1", "d2")
    assert(ccRun(Dedup.starContractionCC(star.localCheckpoint())) ===
      ccRun(Dedup.unionFindCC(star)))
    val rnd = new scala.util.Random(42)
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)
    } ++ Seq((500L, 501L), (501L, 500L), (500L, 501L)) // dupes + reverse
    val rdf = edges.toDF("d1", "d2")
    // star contraction drops self-loops internally; pre-filter for the
    // union-find side so singleton self-loop nodes compare equal
    val noLoops = rdf.filter(
      org.apache.spark.sql.functions.col("d1") =!=
        org.apache.spark.sql.functions.col("d2"))
    assert(ccRun(Dedup.starContractionCC(rdf.localCheckpoint())) ===
      ccRun(Dedup.unionFindCC(noLoops)))
  }

  test("union-find and label propagation agree on the real corpus pair graph") {
    import spark.implicits._
    val pairs = Dedup.minhashLsh(spark, dir)
      .select(org.apache.spark.sql.functions.col("d1"),
        org.apache.spark.sql.functions.col("d2")).localCheckpoint()
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "canonical_id", "cluster_size")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(Dedup.unionFindCC(pairs)) === run(Dedup.labelPropagationCC(pairs)))
  }

  test("hot-bucket cap bounds a degenerate near-identical cluster") {
    import spark.implicits._
    // 60 docs sharing one long boilerplate prefix: every minhash band
    // bucket holds all 60 → 1770 candidate pairs without a cap.
    val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 60L).map(i => (i, s"$boiler variant$i"))
      .toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val sh = Dedup.hashedShingles(docs, Dedup.MaxShingleDf)
    val uncapped = Dedup.minhashCandidates(sh, bucketCap = 1000).count()
    val capped = Dedup.minhashCandidates(sh, bucketCap = 10).count()
    assert(uncapped > 1000, s"degenerate cluster should explode uncapped: $uncapped")
    assert(capped === 0, s"cap=10 must drop the 60-doc buckets entirely: $capped")
  }

  test("simhash bucket cap drops an identical-signature flood") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, "same text every row"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(docs, bucketCap = 1000).count()
    val capped = Dedup.simhashPairs(docs, bucketCap = 10).count()
    assert(uncapped === 50L * 49 / 2)
    assert(capped === 0)
  }

  test("shingle doc-frequency cap drops boilerplate shingles from the join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max}
    // The shingle "a b c" appears in every doc; all others are unique.
    val docs = (0L until 30L).map(i => (i, s"a b c tail$i x$i y$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.hashedShingles(docs, maxDf = 10)
    assert(capped.count() === 30L * 3, "3 unique shingles per doc survive")
    val maxDf = capped.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).as[Long].head()
    assert(maxDf === 1L, "no cross-document shingle survives the cap")
  }

  // The band/block bucket caps are engine-side only — the DuckDB twins
  // (nearDupPairsSql, simhashSql) are ground-truth and cap-free, so a cap
  // that binds on real data silently drops true near-dup pairs. This guard
  // runs at EVERY scale the harness exercises (gate sf0.01, bench sf0.1,
  // warm-up sf0.001), not just the gate SF.
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
    test(s"caps do not bind at $sf (binding would diverge from the cap-free oracles)") {
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.register(spark)
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      // minhash band buckets (same construction as minhashCandidates)
      val sigs = Dedup.hashedShingles(docs, Dedup.MaxShingleDf)
        .groupBy(col("doc_id"))
        .agg(call_function("graft_minhash_sigs", col("sh"), lit(Dedup.NumHashes)).as("sig"))
      val bandStructs = (0 until Dedup.Bands).map { b =>
        struct(lit(b).as("band"),
          hash((Dedup.RowsPerBand * b until Dedup.RowsPerBand * (b + 1))
            .map(i => col("sig").getItem(i)): _*).as("bucket"))
      }
      val maxBand = sigs
        .select(explode(array(bandStructs: _*)).as("bb"))
        .groupBy(col("bb.band"), col("bb.bucket")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxBand < Dedup.MaxBucketSize,
        s"minhash band bucket of $maxBand would hit the ${Dedup.MaxBucketSize} cap " +
          "and silently diverge from the cap-free oracle")
      // simhash block buckets
      val blockStructs = (0 until Dedup.SimHashBlocks).map { b =>
        struct(lit(b).as("blk"),
          expr(s"shiftrightunsigned(simhash, ${b * 16}) & 65535").as("bits"))
      }
      val maxBlock = docs
        .select(expr("graft_simhash64(split(text, ' '))").as("simhash"))
        .select(explode(array(blockStructs: _*)).as("bb"))
        .groupBy(col("bb.blk"), col("bb.bits")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxBlock < Dedup.SimHashBucketCap,
        s"simhash block bucket of $maxBlock would hit the ${Dedup.SimHashBucketCap} cap " +
          "and silently diverge from the cap-free oracle")
      spark.sharedState.cacheManager.clearCache()
    }

  test("bounded-collect candidate pairs equal the classic bucket self-join formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // The one-shuffle bounded-collect pairing must produce EXACTLY the
    // pair SET of the textbook formulation it replaced (bucket table
    // self-joined on (band, bucket) with a count-based hot-bucket cap) —
    // multiplicity aside, which consumers ignore.
    val sh = Dedup.hashedShingles(
      graft.Tables.documents(spark, "/root/testdata/sf0.01"), Dedup.MaxShingleDf)
    val sigs = sh.groupBy(col("doc_id"))
      .agg(call_function("graft_minhash_sigs", col("sh"), lit(Dedup.NumHashes)).as("sig"))
    val bandStructs = (0 until Dedup.Bands).map { b =>
      struct(lit(b).as("band"),
        hash((Dedup.RowsPerBand * b until Dedup.RowsPerBand * (b + 1))
          .map(i => col("sig").getItem(i)): _*).as("bucket"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    val hot = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).filter(col("n") > Dedup.MaxBucketSize)
      .select(col("band"), col("bucket"))
    val kept = buckets.join(hot, Seq("band", "bucket"), "left_anti")
    val classic = kept.as("x").join(kept.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct().as[(Long, Long)].collect().toSet
    val bounded = Dedup.minhashCandidates(sh, Dedup.MaxBucketSize)
      .distinct().as[(Long, Long)].collect().toSet
    buckets.unpersist()
    spark.sharedState.cacheManager.clearCache()
    assert(bounded === classic)
    assert(bounded.nonEmpty)
  }

  test("minhash banding recall covers the exact-Jaccard ground truth (gate SF)") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // Banding recall is probabilistic (≈ 1-(1-s⁴)¹⁶ per pair; 0.9998 at
    // s = 0.8, lower for pairs barely above threshold). The oracle gate is
    // hash-exact against the cap-free ground truth, so a single missed pair
    // on a regenerated corpus fails the gate even though the code works as
    // designed. This diagnostic separates the two failure modes: if it
    // fails while the unit tests pass, the gate mismatch is banding recall
    // on an unlucky pair — a corpus property — not a code bug.
    val sh = Dedup.hashedShingles(
      graft.Tables.documents(spark, "/root/testdata/sf0.01"), Dedup.MaxShingleDf)
    val truth = Dedup.verifiedPairs(
      sh, // exact tier: every co-shingled pair is a candidate
      sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct(),
      0.8).select(col("d1"), col("d2"))
    val cand = Dedup.minhashCandidates(sh, Dedup.MaxBucketSize)
    val missed = truth.exceptAll(cand.select(col("d1"), col("d2"))).count()
    spark.sharedState.cacheManager.clearCache()
    assert(missed === 0,
      s"banding missed $missed ground-truth pair(s): gate failures on this " +
        "corpus are attributable to LSH recall, not candidate-join bugs")
  }

  test("corpus-scaled minhash cap recovers near-dup families wider than the floor") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // The r16 scale bug (found by the sf100 mod-20 slice campaign, where
    // width-1000 replica families left the engine at 178 of 12,829
    // ground-truth pairs): minhashLsh's candidate buckets were capped at
    // a FIXED MaxBucketSize=100 while its oracle is the bandless
    // uncapped >=0.8 pair set, so any near-dup family wider than the cap
    // had its band buckets NULLed and its pairs silently dropped.
    // Synthetic regression: one 120-doc family of identical texts inside
    // a 600-doc corpus. All 7,140 within-family pairs are ground truth
    // (jaccard 1.0, identical signatures -> ONE bucket of 120 per band).
    val docs = (0L until 600L).map { i =>
      val text =
        if (i < 120) "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        else s"unique token stream number $i with filler ${i * 7} and ${i * 13} tail"
      (i, text)
    }.toDF("doc_id", "text")
    val cap = Dedup.minhashCap(docs)
    assert(cap >= 120,
      s"minhashCap($cap) must cover the 120-wide family at N=600 (N/5 = 120)")
    val fixed = Dedup.candidatesFromSigs(Dedup.rowSigs(docs), Dedup.MaxBucketSize)
      .distinct().count()
    val scaled = Dedup.candidatesFromSigs(Dedup.rowSigs(docs), cap)
      .distinct().count()
    spark.sharedState.cacheManager.clearCache()
    assert(fixed === 0L,
      s"fixed cap unexpectedly kept $fixed pairs - the regression premise changed")
    assert(scaled === 120L * 119L / 2L,
      s"scaled cap recovered $scaled of ${120 * 119 / 2} family pairs")
  }
}
