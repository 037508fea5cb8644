package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Engine-side scale checks for the ORACLE-FRONTIER queries — the ~dozen
  * inventory entries whose DuckDB twin is intractable at sf10+ (quadratic
  * truth tiers, recursive graph CTEs that exhaust spill). Their engine
  * outputs at scale would otherwise carry no evidence beyond sf0.1; each
  * check here re-derives or constraint-proves the DUMPED output (the
  * parquet `graft.Verify` wrote at that SF) with Spark-side math that
  * stays linear, so the artifact "verified at sf10" extends past the
  * oracle's reach. Two check species:
  *
  *  - PROOFS: the output's defining property is verified against the full
  *    input (skyline dominance — sound AND complete; BFS distance
  *    constraints, which uniquely pin the fixed-round min-dist table;
  *    pair-soundness recomputation for minhash/simhash/phash/semantic;
  *    ADC/IVF score recomputation). These hold on ALL rows at the full SF.
  *  - SLICE EQUALITY: where completeness is only checkable quadratically
  *    (hamming/jaccard truth), the all-pairs truth is recomputed on the
  *    deterministic cluster-preserving `% 20` slice (see
  *    [[graft.ScaleSample]]) and the dump restricted to slice pairs must
  *    EQUAL it — banding completeness (pigeonhole for hamming ≤ 3) means
  *    equality, not just containment, is the contract.
  *
  * Every check returns (pass, detail); the main prints one JSON line per
  * check and exits non-zero on any failure. Driver-independent: pure
  * Spark, no DuckDB.
  */
object ScaleChecks {

  private def dump(spark: SparkSession, outDir: String, name: String): DataFrame =
    spark.read.parquet(s"$outDir/$name")

  /** Doc-slice modulus for the quadratic slice-truth legs. 20 keeps the
    * sf10 slice at ~25k docs (≈3·10⁸ brute-force hamming ops — seconds);
    * sf100 runs set SPARK_GRAFT_SLICE_MOD=200 so the slice stays the
    * same absolute size as the corpus decades up. Must divide the
    * ScaleGen id stride (a power of ten ≥ 10⁴) to stay
    * cluster-preserving. */
  private def SliceMod: Long =
    sys.env.get("SPARK_GRAFT_SLICE_MOD").flatMap(_.toLongOption).getOrElse(20L)

  type Result = (String, Boolean, Map[String, Long])

  /** Full skyline proof: R ⊆ part, no part row dominates any R row
    * (soundness), every part row outside R is dominated by an R row
    * (completeness — sufficient because dominance chains end in maximal,
    * i.e. skyline, points). All three legs are broadcast-R joins over one
    * part scan: linear at any SF. */
  def skylineProof(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val r = dump(spark, outDir, "skyline_pareto")
      .select(col("p_partkey").as("rk"), col("p_retailprice").as("rp"),
        col("p_size").as("rs"))
    val pts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    def dominates(bp: Column, bs: Column, ap: Column, as_ : Column): Column =
      bp <= ap && bs >= as_ && (bp < ap || bs > as_)
    val nR = r.count()
    val subsetOk = r.join(pts,
      col("rk") === col("p_partkey") && col("rp") === col("p_retailprice") &&
        col("rs") === col("p_size")).count() == nR
    val sound = pts.join(broadcast(r),
      dominates(col("p_retailprice"), col("p_size"), col("rp"), col("rs")))
      .count()
    val undominatedOutside = pts
      .join(broadcast(r.select(col("rk"))), col("p_partkey") === col("rk"),
        "left_anti")
      .join(broadcast(r),
        dominates(col("rp"), col("rs"), col("p_retailprice"), col("p_size")),
        "left_anti")
      .count()
    ("skyline_proof", subsetOk && sound == 0 && undominatedOutside == 0,
      Map("skyline_rows" -> nR, "dominated_in_result" -> sound,
        "undominated_missing" -> undominatedOutside))
  }

  /** BFS constraint proof. The query is a fixed 4-round min-distance
    * unroll from u:min(user_id); its output D is uniquely characterized by
    *  (1) source row (u:minUser, 0) present, nothing else at dist 0;
    *  (2) parent: every row at dist k>0 has an in-edge from a row at k−1
    *      (no value too small / unreachable);
    *  (3) expansion: no edge (u→v) with D(u) ≤ 3 and (v ∉ D or
    *      D(v) > D(u)+1) (no value too large, nobody missing);
    *  (4) all dists in [0, 4].
    * Each leg is an equi-join of the edge list against the broadcastable
    * distance table — linear in edges. */
  def bfsProof(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_bfs_distances")
    val ev = Tables.events(spark, sfDir)
    val e0 = ev.select(concat(lit("u:"), col("user_id")).as("a"),
        concat(lit("t:"), col("event_type")).as("b")).distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcNode = ev.agg(concat(lit("u:"), min(col("user_id")))).head().getString(0)
    val zeroRows = d.filter(col("dist") === 0)
      .select(col("node")).collect().map(_.getString(0)).toSeq
    val srcOk = zeroRows == Seq(srcNode)
    val rangeBad = d.filter(col("dist") < 0 || col("dist") > 4).count()
    val dk = d.select(col("node"), col("dist"))
    val noParent = dk.filter(col("dist") > 0).as("x")
      .join(edges.as("e"), col("e.dst") === col("x.node"), "left_outer")
      .join(dk.as("p"),
        col("p.node") === col("e.src") && col("p.dist") === col("x.dist") - 1,
        "left_outer")
      .groupBy(col("x.node"))
      .agg(max(when(col("p.node").isNotNull, 1).otherwise(0)).as("hasP"))
      .filter(col("hasP") === 0).count()
    val expansionBad = edges.as("e")
      .join(dk.as("u"), col("u.node") === col("e.src"))
      .filter(col("u.dist") <= 3)
      .join(dk.as("v"), col("v.node") === col("e.dst"), "left_outer")
      .filter(col("v.node").isNull || col("v.dist") > col("u.dist") + 1)
      .count()
    edges.unpersist()
    ("bfs_proof", srcOk && rangeBad == 0 && noParent == 0 && expansionBad == 0,
      Map("rows" -> d.count(), "range_bad" -> rangeBad,
        "no_parent" -> noParent, "expansion_bad" -> expansionBad))
  }

  /** MinHash pair soundness: re-derive (n1, n2, common, jaccard) for every
    * dumped pair from the df-capped shingle table and require the full
    * row set to match exactly (both-ways exceptAll = ∅) — in particular
    * every dumped pair re-verifies at jaccard ≥ 0.8. Linear in pairs. */
  def minhashSoundness(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val p = dump(spark, outDir, "dedup_minhash_lsh")
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.hashedShingles(docs, Dedup.MaxShingleDf)
    val re = Dedup.verifiedPairs(sh, p.select(col("d1"), col("d2")), 0.8)
    val extra = p.exceptAll(re).count()
    val missing = re.exceptAll(p).count()
    ("minhash_soundness", extra == 0 && missing == 0,
      Map("pairs" -> p.count(), "not_rederived" -> extra,
        "rederived_not_dumped" -> missing))
  }

  /** Slice-equality for a hamming-pair dump: recompute signatures, take
    * the EXACT all-pairs hamming ≤ K truth on the `% 20` slice, and
    * require the dump restricted to slice pairs to equal it (banding is
    * pigeonhole-complete for K ≤ 3, so equality is the contract, not
    * recall). Also re-derives the hamming value of EVERY dumped pair at
    * the full SF (soundness). */
  private def hammingPairCheck(name: String, pairs: DataFrame,
      sigs: DataFrame, cap: Int): Result = {
    // sigs: (doc_id, simhash)
    val s1 = sigs.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val s2 = sigs.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val re = pairs.join(s1, "d1").join(s2, "d2")
      .withColumn("rh", expr("cast(bit_count(h1 ^ h2) as bigint)"))
    val soundBad = re.filter(col("rh") =!= col("hamming") ||
      col("rh") > Dedup.SimHashK).count()
    val slice = sigs.filter(pmod(col("doc_id"), lit(SliceMod)) === 0)
    val truth = slice.as("a").join(slice.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          expr("bit_count(a.simhash ^ b.simhash)") <= Dedup.SimHashK)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").as("hamming"))
    val dumpSlice = pairs.filter(
      pmod(col("d1"), lit(SliceMod)) === 0 && pmod(col("d2"), lit(SliceMod)) === 0)
    val missing = truth.exceptAll(dumpSlice).count()
    val extra = dumpSlice.exceptAll(truth).count()
    // r20 FULL-CORPUS banding recount (r19 VERDICT task 5): re-derive the
    // ENTIRE dumped pair set from the signatures with an INDEPENDENT
    // dataflow — bounded-collect buckets + in-array slice expansion (the
    // linkpred recount shape) instead of the query's (blk, bits)
    // self-JOIN expansion — under identical cap semantics
    // (graft_bounded_collect's NULL on >cap members IS dropHotBuckets'
    // count>cap drop), re-derive each candidate's hamming from the
    // signatures, and require exact set equality with the dump. Linear
    // in docs×4 block rows plus candidate volume, so it runs at the
    // decades where the all-pairs twin (and, past mod-20, even the
    // slice-truth cartesian above) is out of reach. Peak per-row memory
    // is one bucket slice (≤ cap longs), never a pair array.
    val blocks = Dedup.simhashBlockRows(sigs, "simhash")
    val buckets = blocks.groupBy(col("blk"), col("bits"))
      .agg(call_function("graft_bounded_collect",
        col("doc_id"), lit(cap)).as("ds"))
      .filter(col("ds").isNotNull && size(col("ds")) >= 2)
    val cand = buckets
      .select(col("ds"), posexplode(col("ds")))
      .toDF("ds", "i", "da")
      .select(col("da"), explode(expr("slice(ds, i + 2, size(ds))")).as("db"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"))
      .distinct()
    val re2 = cand.join(s1, "d1").join(s2, "d2")
      .withColumn("hamming", expr("cast(bit_count(h1 ^ h2) as bigint)"))
      .filter(col("hamming") <= Dedup.SimHashK)
      .select(col("d1"), col("d2"), col("hamming"))
    val rbMissing = re2.exceptAll(pairs).count()
    val rbExtra = pairs.exceptAll(re2).count()
    (name,
      soundBad == 0 && missing == 0 && extra == 0 &&
        rbMissing == 0 && rbExtra == 0,
      Map("pairs" -> pairs.count(), "hamming_mismatch" -> soundBad,
        "slice_truth_pairs" -> truth.count(),
        "slice_missing" -> missing, "slice_extra" -> extra,
        "recount_missing" -> rbMissing, "recount_extra" -> rbExtra))
  }

  def simhashCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("graft_simhash64(split(text, ' '))").as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = hammingPairCheck("simhash_check",
      dump(spark, outDir, "dedup_simhash").select(col("d1"), col("d2"), col("hamming")),
      sigs, Dedup.simhashCapFor(Tables.documents(spark, sfDir).count()))
    sigs.unpersist()
    r
  }

  def phashCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val sigs = graft.multimodal.Multimodal.imageAssets(spark, sfDir)
      .mapPartitions(graft.multimodal.Multimodal.phashes).toDF()
      .select(col("doc_id"), col("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = hammingPairCheck("phash_check",
      dump(spark, outDir, "multimodal_phash_dedup")
        .select(col("d1"), col("d2"), col("hamming")),
      sigs,
      graft.multimodal.Multimodal.phashCapFor(
        Tables.documents(spark, sfDir).count()))
    sigs.unpersist()
    r
  }

  /** Incremental-dedup soundness + slice equality: every dumped
    * (new_doc → dup_of) match re-verifies (chunk order, hamming value,
    * ≤ K) at the full SF, and on the slice the dump equals the
    * from-scratch best-match recomputation (banding completeness makes
    * the best match exact). */
  def incrementalCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val p = dump(spark, outDir, "stream_incremental_dedup")
    val sigs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("graft_simhash64(split(text, ' '))").as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s1 = sigs.select(col("doc_id").as("new_doc"), col("simhash").as("h1"))
    val s2 = sigs.select(col("doc_id").as("dup_of"), col("simhash").as("h2"))
    val soundBad = p.join(s1, "new_doc").join(s2, "dup_of")
      .filter(expr("cast(bit_count(h1 ^ h2) as bigint)") =!= col("hamming") ||
        col("hamming") > Dedup.SimHashK ||
        pmod(col("dup_of"), lit(3L)) >= pmod(col("new_doc"), lit(3L)) ||
        col("new_chunk") =!= pmod(col("new_doc"), lit(3L)))
      .count()
    // slice: exact best predecessor per new doc among earlier chunks
    val slice = sigs.filter(pmod(col("doc_id"), lit(SliceMod)) === 0)
    val truth = slice.as("n").join(slice.as("o"),
        pmod(col("o.doc_id"), lit(3L)) < pmod(col("n.doc_id"), lit(3L)) &&
          expr("bit_count(n.simhash ^ o.simhash)") <= Dedup.SimHashK)
      .select(col("n.doc_id").as("new_doc"),
        struct(expr("cast(bit_count(n.simhash ^ o.simhash) as bigint)").as("h"),
          col("o.doc_id").as("d")).as("cand"))
      .groupBy(col("new_doc")).agg(min(col("cand")).as("best"))
      .select(col("new_doc"), pmod(col("new_doc"), lit(3L)).as("new_chunk"),
        col("best.d").as("dup_of"), col("best.h").as("hamming"))
    val dumpSlice = p.filter(pmod(col("new_doc"), lit(SliceMod)) === 0 &&
      pmod(col("dup_of"), lit(SliceMod)) === 0)
    // truth's best match may live outside the slice; compare only rows
    // whose truth-best is in-slice — i.e. slice-truth rows must appear in
    // the dump with an at-least-as-good (h, d) key, and every dumped
    // slice row must re-verify (done above). The containment leg:
    val missing = truth.as("t")
      .join(p.as("d"), col("t.new_doc") === col("d.new_doc"), "left_outer")
      .filter(col("d.new_doc").isNull ||
        struct(col("d.hamming"), col("d.dup_of")) >
          struct(col("t.hamming"), col("t.dup_of")))
      .count()
    sigs.unpersist()
    ("incremental_check", soundBad == 0 && missing == 0,
      Map("rows" -> p.count(), "sound_bad" -> soundBad,
        "slice_worse_than_truth" -> missing))
  }

  /** Semantic-dedup re-derivation: (a) kept ⇔ no dup_of; (b) every
    * (vec, dup_of) pair is same-cluster, dup_of < vec, and its rounded
    * cosine ≥ τ (re-scored from raw vectors); (c) the dumped cid equals
    * a from-scratch rerun of the deterministic Lloyd assignment for
    * every vector. */
  def semanticCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val d = dump(spark, outDir, "dedup_semantic")
    val em = Tables.embeddings(spark, sfDir)
    val n = em.count()
    val k = Similarity.ivfCellsFor(n)
    val cap = Dedup.semClusterCap(n)
    val cents = Similarity.lloydCentroidsScaled(em, k, Dedup.SemRounds)
    val cells = Similarity.assignCells(em, cents)
    // r17 cap-policy census: the corpus-scaled guard (4× mean, floor
    // 1000) vs the old fixed 1000 — clusters in (1000, cap] are the ones
    // the fixed cap silently excluded from pairing at this SF; over-cap
    // clusters must contain NO dup decision (soundness of the guard).
    val sizes = cells.groupBy(col("cid")).agg(count(lit(1)).as("csz"))
      .persist()
    val over1000 = sizes.filter(col("csz") > 1000).count()
    val overCap = sizes.filter(col("csz") > cap).count()
    val maxCluster = sizes.agg(max(col("csz"))).collect()(0).getLong(0)
    val capBad = d.filter(col("dup_of").isNotNull)
      .join(sizes, "cid").filter(col("csz") > cap).count()
    sizes.unpersist()
    val keptBad = d.filter(col("kept") =!= col("dup_of").isNull).count()
    val cidBad = d.as("d").join(cells.as("c"), col("d.vec_id") === col("c.vec_id"))
      .filter(col("d.cid") =!= col("c.cid")).count()
    val e1 = em.select(col("vec_id").as("v1"), col("embedding").as("x1"))
    val e2 = em.select(col("vec_id").as("v2"), col("embedding").as("x2"))
    val pairBad = d.filter(col("dup_of").isNotNull).as("d")
      .join(d.select(col("vec_id").as("dup_of"), col("cid").as("cid2")), "dup_of")
      .join(e1, col("d.vec_id") === col("v1"))
      .join(e2, col("dup_of") === col("v2"))
      .filter(col("dup_of") >= col("d.vec_id") ||
        col("cid2") =!= col("d.cid") ||
        round(Similarity.dot(col("x1"), col("x2")) /
          (sqrt(Similarity.sqNorm(col("x1"))) * sqrt(Similarity.sqNorm(col("x2")))),
          6) < Dedup.SemTau)
      .count()
    ("semantic_check",
      keptBad == 0 && cidBad == 0 && pairBad == 0 && capBad == 0,
      Map("rows" -> d.count(), "kept_bad" -> keptBad, "cid_bad" -> cidBad,
        "pair_bad" -> pairBad, "cap_bad" -> capBad, "cap" -> cap.toLong,
        "clusters_over_1000" -> over1000, "clusters_over_cap" -> overCap,
        "max_cluster" -> maxCluster))
  }

  /** IVF consistency: every dumped neighbor's recomputed cell is among
    * its query's probed cells, its cos_sim re-scores identically, and —
    * for the `% 1000` query sample — the dumped top-3 EQUALS the exact
    * rerank over the probed cells (full equality on the sampled
    * sub-problem). */
  def ivfCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val d = dump(spark, outDir, "sim_ann_ivf")
    val em = Tables.embeddings(spark, sfDir)
    val k = Similarity.ivfCellsFor(em.count())
    val cents = Similarity.lloydCentroidsScaled(em, k, Similarity.IvfRounds)
    val bc = Similarity.broadcastQuantizer(em, cents)
    val cells = Similarity.assignCellsBc(em, bc)
      .withColumn("sq", call_function("graft_vec_sqnorm", col("embedding")))
    // only the dump's query sample (vec_id % 50) — at large SFs an
    // O(corpus) broadcast carrying embeddings + probe arrays would hit
    // the driver/broadcast limits long before the checks themselves do
    val qs = em.filter(pmod(col("vec_id"), lit(Similarity.PqQueryMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        call_function("graft_vec_sqnorm", col("embedding")).as("q_sq"),
        Similarity.nearestCellsCol(bc, col("embedding"), Similarity.IvfProbe)
          .as("probed"))
    val joined = d.as("d")
      .join(broadcast(qs.as("q")), col("d.query_id") === col("q.query_id"))
      .join(cells.as("m"), col("d.vec_id") === col("m.vec_id"))
    val probeBad = joined.filter(!array_contains(col("probed"), col("m.cid"))).count()
    val scoreBad = joined.filter(
      round(call_function("graft_vec_dot", col("q_emb"), col("m.embedding")) /
        (sqrt(col("q_sq")) * sqrt(col("m.sq"))), 6) =!= col("d.cos_sim")).count()
    // sampled exact rerank equality
    val sq = qs.filter(pmod(col("query_id"), lit(1000L)) === 0)
      .withColumn("cid", explode(col("probed"))).drop("probed")
    val rescored = broadcast(sq).join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(call_function("graft_vec_dot", col("q_emb"), col("embedding")) /
          (sqrt(col("q_sq")) * sqrt(col("sq"))), 6).as("cos_sim"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val exact3 = rescored.withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 3)
    val dumpS = d.filter(pmod(col("query_id"), lit(1000L)) === 0)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rnk").cast("int").as("rnk"))
    val exactBad = dumpS.exceptAll(exact3).count() + exact3.exceptAll(dumpS).count()
    ("ivf_check", probeBad == 0 && scoreBad == 0 && exactBad == 0,
      Map("rows" -> d.count(), "probe_bad" -> probeBad,
        "score_bad" -> scoreBad, "sampled_exact_bad" -> exactBad))
  }

  /** PQ/ADC re-scoring: re-encode every dumped neighbor's code tuple and
    * re-fold the ADC score for its (query, codes) pair — equality on all
    * dumped rows, plus rnk values 1..3 and strictly ordered per query. */
  def pqCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val d = dump(spark, outDir, "sim_ann_pq_adc")
    val em = Tables.embeddings(spark, sfDir)
    val cb = Similarity.pqCodebook(
      Similarity.pqSeeds(em, Similarity.PqK), Similarity.PqK)
    val codes = em.select(col("vec_id") +: (0 until Similarity.PqM).map(m =>
      Similarity.pqCode(cb, Similarity.PqK)(col("embedding"), m).as(s"code$m")): _*)
    val q = em.filter(pmod(col("vec_id"), lit(Similarity.PqQueryMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def dm(m: Int): Column = Similarity.pqAdcTerm(cb, m)
    val re = d.as("d")
      .join(codes.as("c"), col("d.vec_id") === col("c.vec_id"))
      .join(broadcast(q), "query_id")
      .withColumn("re_dot", round(dm(0) + dm(1) + dm(2) + dm(3), 6))
    val scoreBad = re.filter(col("re_dot") =!= col("approx_dot")).count()
    val rnkBad = d.groupBy(col("query_id"))
      .agg(sort_array(collect_list(col("rnk"))).as("rs"))
      .filter(col("rs") =!= array(lit(1), lit(2), lit(3))).count()
    ("pq_check", scoreBad == 0 && rnkBad == 0,
      Map("rows" -> d.count(), "score_bad" -> scoreBad, "rnk_bad" -> rnkBad))
  }

  /** Brute-force equality for the cosine top-k dump on the `% 1000` query
    * sample: the dumped rows for sampled queries must equal an exact
    * re-computation over the FULL corpus — sampled-truth at full scale,
    * O(sample × corpus). */
  def cosineSampledTruth(spark: SparkSession, sfDir: String, outDir: String): Result = {
    graft.functions.GraftFunctions.register(spark)
    val d = dump(spark, outDir, "sim_cosine_topk")
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter(pmod(col("vec_id"), lit(1000L)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = em.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val exact = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    val dumpS = d.filter(pmod(col("query_id"), lit(1000L)) === 0)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rnk").cast("int").as("rnk"))
    val bad = dumpS.exceptAll(exact).count() + exact.exceptAll(dumpS).count()
    ("cosine_sampled_truth", bad == 0,
      Map("dump_rows" -> d.count(), "sampled_rows" -> dumpS.count(),
        "mismatch" -> bad))
  }

  /** LPA dump invariants, linear in nodes + edges (r18 — the mod-2 slice
    * twin is oracle-OOM, so this is the engine-side leg): the
    * community_size census column must equal the actual per-community
    * row count, the dump's node set must equal the co-occurrence graph's
    * node set recounted from the corpus, and every community id must be
    * a graph node (labels originate as node ids; a non-node label would
    * mean the vote invented one). The vote trajectory itself is
    * oracle-checked at every SF the twin can reach (sf0.01 gate, sf10s,
    * sf100s, sf100s5). */
  def lpaCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_label_propagation")
    val e0 = Graph.cooccurrenceEdges(spark, sfDir)
    val nodes = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizeBad = d.groupBy(col("community"), col("community_size"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") =!= col("community_size")).count()
    val dn = d.select(col("node"))
    val nodesBad = dn.exceptAll(nodes).count() + nodes.exceptAll(dn).count()
    val lblBad = d.select(col("community").as("node")).distinct()
      .join(nodes, Seq("node"), "left_anti").count()
    nodes.unpersist()
    ("lpa_check", sizeBad == 0 && nodesBad == 0 && lblBad == 0,
      Map("rows" -> d.count(), "size_bad" -> sizeBad,
        "node_set_bad" -> nodesBad, "label_not_node" -> lblBad))
  }

  /** k-core trajectory invariants: round-0 census equals an independent
    * recount of the undirected co-occurrence edge set (nodes, edges, min
    * degree), and the trajectory is monotone non-increasing in nodes and
    * edges. (End-to-end equality evidence comes from the sampled-oracle
    * run — this pins the full-SF dump to the full-SF graph.) */
  def kcoreCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_kcore_peel").orderBy(col("round"))
      .collect()
    val e0 = Graph.cooccurrenceEdges(spark, sfDir)
    val und = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    val c = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .agg(count(lit(1)), expr("coalesce(sum(deg), 0) div 2"),
        expr("coalesce(min(deg), 0)")).head()
    val r0 = d.head
    val r0Ok = r0.getLong(1) == c.getLong(0) && r0.getLong(2) == c.getLong(1) &&
      r0.getLong(3) == c.getLong(2)
    // filter to full 2-windows: a single-round trajectory makes sliding(2)
    // emit one partial 1-element window, which must count as vacuously ok
    val monoBad = d.sliding(2).filter(_.length == 2).count { w =>
      w(1).getLong(1) > w(0).getLong(1) || w(1).getLong(2) > w(0).getLong(2)
    }
    ("kcore_check", r0Ok && monoBad == 0,
      Map("rounds" -> d.length.toLong,
        "round0_nodes" -> c.getLong(0), "round0_edges" -> c.getLong(1),
        "mono_bad" -> monoBad.toLong))
  }

  /** Independent-algorithm agreement proof for the CC dump: re-cluster
    * the DUMPED minhash pair graph with label propagation (a different
    * algorithm than the union-find / star-contraction paths that
    * produced the dump — `Dedup.connectedComponentsFromPairs` dispatches
    * by edge count) and require exact output equality, plus direct edge
    * closure (every pair's endpoints share a canonical id). Linear in
    * pairs + dump at any SF — this query's DuckDB twin (exact-jaccard
    * pair join + recursive transitive closure) is quadratic in
    * replica-family width, which every cluster-preserving slice keeps
    * by design, so it ENOSPCs >50 GB spill even at 25 k sliced docs. */
  def ccCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val cc = dump(spark, outDir, "dedup_connected_components")
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
    val pairs = dump(spark, outDir, "dedup_minhash_lsh")
      .select(col("d1"), col("d2"))
    val lp = Dedup.labelPropagationCC(pairs)
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
    val disagree = cc.exceptAll(lp).count() + lp.exceptAll(cc).count()
    val cmap = cc.select(col("doc_id"), col("canonical_id"))
    val closureBad = pairs
      .join(cmap.select(col("doc_id").as("d1"), col("canonical_id").as("c1")), Seq("d1"))
      .join(cmap.select(col("doc_id").as("d2"), col("canonical_id").as("c2")), Seq("d2"))
      .filter(col("c1") =!= col("c2")).count()
    ("cc_check", disagree == 0 && closureBad == 0,
      Map("rows" -> cc.count(), "pairs" -> pairs.count(),
        "lp_disagree" -> disagree, "closure_bad" -> closureBad))
  }

  /** Census recomputation for the dedup_apply dump: rebuild the per-lang
    * survivor census from the corpus and the CC dump's drop list
    * (doc_id ≠ canonical_id) and require exact equality — with
    * [[ccCheck]] (CC vs pairs) and minhash_soundness (pairs vs shingles)
    * this closes the linear evidence chain pairs → components → census
    * at SFs where the quadratic twin is out of reach. */
  def applyCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val ap = dump(spark, outDir, "dedup_apply")
      .select(col("lang"), col("n_docs"), col("total_chars"))
    val drop = dump(spark, outDir, "dedup_connected_components")
      .filter(col("doc_id") =!= col("canonical_id")).select(col("doc_id"))
    val expect = Tables.documents(spark, sfDir)
      .join(drop, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .select(col("lang"), col("n_docs"), col("total_chars"))
    val bad = ap.exceptAll(expect).count() + expect.exceptAll(ap).count()
    ("apply_check", bad == 0,
      Map("langs" -> ap.count(), "mismatch" -> bad))
  }

  /** Independent-algorithm recount for the triangle dump (r19 — the only
    * graph member besides link prediction with no engine-side leg; its
    * wedge TWIN is the documented pre-cap frontier above mod-20). The
    * query counts the capped-truncated triangle census by a two-join
    * wedge expansion (e1,e2 capped, closing e3 uncapped); this check
    * recounts the SAME census with a different dataflow — per-node
    * adjacency ARRAYS and per-edge `array_intersect` (the node-iterator
    * formulation: for each capped edge a→b, the closing vertices are
    * cappedOut(b) ∩ orientedOut(a)) — and requires the re-derived top-20
    * (n_triangles DESC, user_id — the dump's own total order) to EQUAL
    * the dump. Linear in edges × cap: array sizes are bounded by the
    * wedge cap (capped side) and the degree-ordered O(√E) out-degree
    * bound (oriented side), so the recount runs at the slice decades
    * where the twin exhausts spill. Detail carries the recounted wedge
    * census and triangle total. */
  def triangleCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_triangle_count")
      .select(col("user_id"), col("n_triangles"))
    val (oriented, capped) = Graph.orientedCapped(spark, sfDir)
    val cOut = capped.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("cnbrs"))
    val oOut = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("onbrs"))
    // every (a → b) capped edge joined to b's capped out-array and a's
    // oriented out-array — two node-keyed shuffles, never a cartesian
    val perEdge = capped
      .join(cOut.select(col("src").as("dst"), col("cnbrs")), "dst")
      .join(oOut.select(col("src"), col("onbrs")), "src")
      .select(col("src"), col("dst"), size(col("cnbrs")).as("n_wedges"),
        array_intersect(col("cnbrs"), col("onbrs")).as("closing"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = perEdge.agg(coalesce(sum(col("n_wedges")), lit(0L)))
      .head().getLong(0)
    val nTri = perEdge.agg(coalesce(sum(size(col("closing"))), lit(0L)))
      .head().getLong(0)
    // participation census: each triangle (a, b, c) credits all three
    // members once — c's come from exploding the closing array, a/b are
    // weighted by the edge's triangle count instead of exploding per
    // triangle (same census, |closing| + 2 credit rows per edge)
    val census = perEdge
      .select(explode(col("closing")).as("user_id"), lit(1L).as("n"))
      .unionByName(perEdge.select(col("src").as("user_id"),
        size(col("closing")).cast("long").as("n")))
      .unionByName(perEdge.select(col("dst").as("user_id"),
        size(col("closing")).cast("long").as("n")))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_triangles"))
      .filter(col("n_triangles") > 0)
    val top = census.orderBy(col("n_triangles").desc, col("user_id")).limit(20)
    val extra = d.exceptAll(top).count()
    val missing = top.exceptAll(d).count()
    perEdge.unpersist()
    oriented.unpersist(); capped.unpersist()
    // r19 ADVICE: the check ran only on slices known to contain
    // triangles, so an empty dump meeting an empty recount is evidence
    // of a broken dump path, not agreement — require dump_rows > 0.
    val dumpRows = d.count()
    ("triangle_check", dumpRows > 0 && extra == 0 && missing == 0,
      Map("dump_rows" -> dumpRows, "wedges" -> wedges, "triangles" -> nTri,
        "dump_not_rederived" -> extra, "rederived_not_dumped" -> missing))
  }

  /** Common-neighbor recount for the link-prediction dump (r19): the
    * query derives wedge counts by a capped-adjacency SELF-JOIN; this
    * check regenerates the identical census with array pair-expansion —
    * each node's ≤[[Graph.MaxNeighbors]] sorted neighbor array expands
    * to its C(n,2) ordered pairs inside ONE codegen'd projection
    * (`transform` × `slice` × `flatten`, no join at all), bounding the
    * expansion at N·C(30,2) rows at any SF. The re-derived top-20
    * non-adjacent pairs (common_neighbors DESC, u, v) must EQUAL the
    * dump, and every dumped pair must be non-adjacent in the recounted
    * edge set (explicit soundness leg, though equality subsumes it). */
  def linkpredCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_link_prediction")
      .select(col("u"), col("v"), col("common_neighbors"))
    val edges = Graph.cooccurrenceEdges(spark, sfDir)
    val adjacentDumped = d.join(edges,
      d("u") === edges("a") && d("v") === edges("b"), "left_semi").count()
    val nbrArr = Graph.cappedAdjacency(spark, sfDir)
      .groupBy(col("a")).agg(sort_array(collect_list(col("b"))).as("nbrs"))
    val pairs = nbrArr.select(explode(expr(
      """flatten(transform(nbrs, (x, i) ->
        |  transform(slice(nbrs, i + 2, size(nbrs) - i - 1),
        |    y -> struct(x AS u, y AS v))))""".stripMargin)).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
    val census = pairs.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(edges, col("u") === col("a") && col("v") === col("b"), "left_anti")
    val top = census
      .orderBy(col("common_neighbors").desc, col("u"), col("v")).limit(20)
    val extra = d.exceptAll(top).count()
    val missing = top.exceptAll(d).count()
    // non-vacuity: the top-20 dump is nonempty on every slice this check
    // targets, so empty-vs-empty agreement must fail (r19 ADVICE, same
    // guard as triangle_check)
    val dumpRows = d.count()
    ("linkpred_check",
      dumpRows > 0 && adjacentDumped == 0 && extra == 0 && missing == 0,
      Map("dump_rows" -> dumpRows, "adjacent_dumped" -> adjacentDumped,
        "dump_not_rederived" -> extra, "rederived_not_dumped" -> missing))
  }

  /** Cross-artifact recomputation for the modularity dump (r19 task 7
    * fallback where the mod-2 twin dies in the shared co-occurrence
    * derivation): rebuild every per-community census — n_nodes, deg_sum,
    * e_intra — from the corpus edge list and the LPA DUMP's labels (the
    * label table already carries lpa_check + its own twin evidence one
    * decade down), re-assemble the contribution with the query's exact
    * double-op order, and require full-row equality. Global invariants
    * Σ deg_sum = 2m and Σ n_nodes = |nodes| pin the censuses to the
    * graph. Linear: two label joins onto the edge list + key-grouped
    * aggregation. */
  def modularityCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_modularity")
    val labels = dump(spark, outDir, "graph_label_propagation")
      .select(col("node"), col("community").as("lbl"))
    val edges = Graph.cooccurrenceEdges(spark, sfDir)
    val m = edges.count()
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val la = labels.select(col("node").as("a"), col("lbl").as("la"))
    val lb = labels.select(col("node").as("b"), col("lbl").as("lb"))
    val intra = edges.join(la, "a").join(lb, "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_intra"))
    val degsum = deg.join(labels, "node")
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).cast("long").as("deg_sum"))
    val t = col("deg_sum").cast("double") / lit(2.0 * m)
    val expect = degsum.join(intra, Seq("lbl"), "left")
      .na.fill(0L, Seq("e_intra"))
      .select(col("lbl").as("community"), col("n_nodes"),
        col("e_intra"), col("deg_sum"),
        round(col("e_intra").cast("double") / lit(m.toDouble) - t * t, 9)
          .as("contribution"))
    val mismatch = d.exceptAll(expect).count() + expect.exceptAll(d).count()
    val sums = d.agg(sum(col("deg_sum")), sum(col("n_nodes"))).head()
    val nNodes = labels.count()
    // r19 ADVICE: an empty/degenerate dump makes both sums NULL — that
    // must be a clean FAIL row, not an NPE out of getLong. (-1 sentinels
    // in the detail map mark the null case.)
    val degOk = !sums.isNullAt(0) && !sums.isNullAt(1) &&
      sums.getLong(0) == 2 * m && sums.getLong(1) == nNodes
    ("modularity_check", mismatch == 0 && degOk,
      Map("communities" -> d.count(), "m" -> m, "nodes" -> nNodes,
        "mismatch" -> mismatch,
        "deg_sum_total" -> (if (sums.isNullAt(0)) -1L else sums.getLong(0)),
        "n_nodes_total" -> (if (sums.isNullAt(1)) -1L else sums.getLong(1))))
  }

  /** Independent-formulation recomputation for the assortativity scalar:
    * the query accumulates (m2, Σx, Σx², Σxy) by broadcasting the degree
    * table onto BOTH edge endpoints; this check derives the same exact
    * integer moments from the degree DISTRIBUTION alone — over the
    * symmetrized list, m2 = Σ deg, Σx = Σ deg², Σx² = Σ deg³, and Σxy =
    * Σ_a deg(a)·S(a) with S(a) the neighbor-degree sum (one join + one
    * aggregate, a different dataflow) — then assembles r with the
    * query's exact double-op order and requires row equality. Exact:
    * decimal(38,0) accumulators; equal integers cast to equal doubles. */
  def assortativityCheck(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val d = dump(spark, outDir, "graph_assortativity")
    val edges = Graph.cooccurrenceEdges(spark, sfDir)
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s = und.join(deg.select(col("a").as("b"), col("deg").as("db")), "b")
      .groupBy(col("a")).agg(sum(col("db").cast("decimal(38,0)")).as("snbr"))
    val mom = deg.join(s, "a")
      .agg(sum(col("deg").cast("decimal(38,0)")).as("m2d"),
        sum((col("deg") * col("deg")).cast("decimal(38,0)")).as("sx"),
        sum((col("deg") * col("deg")).cast("decimal(38,0)") * col("deg")).as("sxx"),
        sum(col("deg").cast("decimal(38,0)") * col("snbr")).as("sxy"))
    val n = col("m2d").cast("double")
    val num = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val den = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val expect = mom.select(
      expr("m2d div 2").cast("long").as("n_edges"),
      when(den > 0.0, round(num / den, 6)).as("assortativity"))
    deg.unpersist()
    val bad = d.exceptAll(expect).count() + expect.exceptAll(d).count()
    ("assortativity_check", bad == 0,
      Map("mismatch" -> bad, "dump_rows" -> d.count()))
  }

  val all: Seq[(String, (SparkSession, String, String) => Result)] = Seq(
    "skyline_proof" -> (skylineProof _),
    "bfs_proof" -> (bfsProof _),
    "minhash_soundness" -> (minhashSoundness _),
    "simhash_check" -> (simhashCheck _),
    "phash_check" -> (phashCheck _),
    "incremental_check" -> (incrementalCheck _),
    "semantic_check" -> (semanticCheck _),
    "ivf_check" -> (ivfCheck _),
    "pq_check" -> (pqCheck _),
    "cosine_sampled_truth" -> (cosineSampledTruth _),
    "kcore_check" -> (kcoreCheck _),
    "lpa_check" -> (lpaCheck _),
    "triangle_check" -> (triangleCheck _),
    "linkpred_check" -> (linkpredCheck _),
    "modularity_check" -> (modularityCheck _),
    "assortativity_check" -> (assortativityCheck _),
    "cc_check" -> (ccCheck _),
    "apply_check" -> (applyCheck _))
}
