package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (north-star extensions beyond the
  * reference): deterministic dataset splitting, context-window sequence
  * packing, normalization, repetition-based quality scoring, and
  * benchmark decontamination. Every op is engine-independent by
  * construction (pure integer/string arithmetic, total output order) so
  * the DuckDB twins gate them hash-exactly.
  *
  * Scale design:
  *  - Splitting is a stateless per-row hash — no shuffle at all; the
  *    aggregate view groups on (lang, split), map-side combined.
  *  - Packing windows per (lang): the prefix sum shuffles each stratum
  *    once; production packs per shard exactly like this (a global pack
  *    order is inherently sequential and never what you want at 100 TB).
  *  - Normalization/repetition are per-row codegen expressions (no
  *    explode — bigram stats fold inside `transform`/`array_distinct`).
  *  - Decontamination reuses the capped shingle machinery from [[Dedup]]:
  *    the benchmark side is distinct-shingled and the corpus side
  *    semi-joins against it — the corpus never shuffles more than its
  *    shingle explode, and the benchmark set (small by definition) rides
  *    a broadcast.
  */
object Pipeline {

  /** Deterministic train/val/test split by multiplicative hashing of the
    * stable doc id (NOT rand(): reruns and engines must agree). Constants
    * fit BIGINT for any realistic id (ANSI-safe to ~8e13 docs). Output is
    * the per-(lang, split) census a pipeline records when materializing
    * splits. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    hashSplitDf(Tables.documents(spark, dir))

  private[ops] def hashSplitDf(d: DataFrame): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(115249L) + lit(33391L), lit(10L))
    d.withColumn("split",
        when(bucket < 8, lit("train")).when(bucket === 8, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .sortSmall(col("lang"), col("split"))
  }

  // (x % 10 + 10) % 10 == Spark's pmod for negative x too — the twin must
  // not depend on doc_id's sign (DuckDB % returns negative remainders).
  val hashSplitSql: String =
    """SELECT lang,
      |  CASE WHEN ((doc_id*115249+33391) % 10 + 10) % 10 < 8 THEN 'train'
      |       WHEN ((doc_id*115249+33391) % 10 + 10) % 10 = 8 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  private val PackBudget = 2048L // tokens per packed context window

  /** Concat-and-chunk sequence packing: docs are laid out in stable
    * (lang, doc_id) order and cut into fixed token-budget windows by the
    * EXCLUSIVE running token count — the standard pretraining packing
    * layout (documents concatenated, chunked every `PackBudget` tokens).
    * One window shuffle per stratum; emits the per-chunk manifest. */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesDf(Tables.documents(spark, dir))

  private[ops] def packSequencesDf(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    d.select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("chunk", expr(s"(cum - tokens) div $PackBudget"))
      .groupBy(col("lang"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("chunk"))
  }

  val packSequencesSql: String =
    s"""WITH sized AS (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |cum AS (
      |  SELECT lang, doc_id, tokens,
      |    CAST(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM sized)
      |SELECT lang, (cum - tokens) // $PackBudget AS chunk,
      |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM cum GROUP BY 1, 2 ORDER BY lang, chunk""".stripMargin

  /** Normalization census: lowercase, strip non-alphanumerics, collapse
    * runs of spaces, trim — then count distinct surviving forms per lang
    * (the "how much does normalization collapse" signal that decides
    * whether normalized exact-dedup is worth a pass). Pure per-row
    * regexp work inside codegen; one map-side-combined aggregate. */
  def normalizeStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    normalizeStatsDf(Tables.documents(spark, dir))
  }

  private[ops] def normalizeStatsDf(d: DataFrame): DataFrame = {
    // r20: single-pass graft_norm_text instead of the 2-regex chain (see
    // Dedup.exactNormalized — same expression, same equivalence pin)
    val norm = call_function("graft_norm_text", col("text"))
    d.select(col("lang"), norm.as("norm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("norm")).as("n_distinct_norm"),
        round(sum(length(col("norm"))) / count(lit(1)), 6).as("avg_norm_len"))
      .sortSmall(col("lang"))
  }

  val normalizeStatsSql: String =
    """WITH n AS (
      |  SELECT lang,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |      ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT norm) AS n_distinct_norm,
      |  round(CAST(SUM(length(norm)) AS BIGINT) / COUNT(*), 6) AS avg_norm_len
      |FROM n GROUP BY lang ORDER BY lang""".stripMargin

  /** Repetition-ratio quality signal: fraction of repeated word bigrams
    * per document (1 − distinct/total), the cheap boilerplate/spam
    * detector every corpus filter runs. Bigrams are built and deduped
    * INSIDE the row (`transform` + `array_distinct` — no explode, no
    * shuffle); output is the worst-50 list a reviewer would eyeball.
    * String bigrams, not hashes: the ratio must be collision-exact to
    * hash-match the oracle. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    repetitionScoreDf(Tables.documents(spark, dir))

  private[ops] def repetitionScoreDf(d: DataFrame): DataFrame = {
    // token-count guard BEFORE sequence(): for a 1-token doc
    // sequence(0, -1) descends and would fabricate null bigrams
    d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        expr("transform(sequence(0, size(t)-2), " +
          "i -> concat(t[i], ' ', t[i+1]))").as("bg"))
      .select(col("doc_id"), size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") / col("n_bigrams"), 6).as("rep_ratio"))
      .orderBy(col("rep_ratio").desc, col("doc_id"))
      .limit(50)
  }

  val repetitionScoreSql: String =
    """WITH bg AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(string_split(text,' '))),
      |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]) AS bg
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(bg) AS BIGINT) AS n_bigrams,
      |  CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
      |  round(1.0 - CAST(len(list_distinct(bg)) AS BIGINT)
      |    / CAST(len(bg) AS BIGINT), 6) AS rep_ratio
      |FROM bg WHERE len(bg) >= 1
      |ORDER BY rep_ratio DESC, doc_id LIMIT 50""".stripMargin

  /** Benchmark decontamination: flag corpus docs sharing any 3-gram
    * shingle with the benchmark side (stand-in: `source = 'src0'`), with
    * the shared-shingle count — the overlap audit run before training to
    * keep eval data out of the corpus. Shingles come from
    * [[Dedup.hashedShingles]] (df-capped on the FULL corpus, same cap in
    * the twin): boilerplate shingles would otherwise flag everything.
    * The benchmark doc-id list and its distinct shingle set are broadcast
    * — benchmark sets are small by definition — so the corpus side never
    * shuffles beyond its shingle explode. Shingle identity is the same
    * 64-bit composed hash as the dedup tier (collision odds ~2e-11,
    * cross-checked by the string-shingled oracle on this corpus). */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationDf(Tables.documents(spark, dir))

  private[ops] def contaminationDf(d: DataFrame): DataFrame = {
    val sh = Dedup.hashedShingles(d, Dedup.MaxShingleDf)
    val benchIds = d.filter(col("source") === "src0").select(col("doc_id"))
    // no distinct() before the broadcast: a semi-join build side dedups
    // its keys internally, so the pre-shuffle would be pure overhead
    val benchSh = sh.join(broadcast(benchIds), Seq("doc_id"), "left_semi")
      .select(col("sh"))
    sh.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
      .join(broadcast(benchSh), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS pos
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id,
      |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
      |sh AS (
      |  SELECT doc_id, shingle FROM sh0
      |  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= ${Dedup.MaxShingleDf}),
      |bench AS (
      |  SELECT DISTINCT shingle FROM sh
      |  JOIN documents USING (doc_id) WHERE source = 'src0')
      |SELECT s.doc_id, COUNT(*) AS n_shared
      |FROM sh s
      |JOIN documents d USING (doc_id)
      |JOIN bench b ON b.shingle = s.shingle
      |WHERE d.source <> 'src0'
      |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  /** Quality-filter funnel: the cumulative heuristic cascade with a
    * per-stage survivor census — the attrition report a corpus pipeline
    * emits when tuning filters. ONE corpus pass: every stage is a per-row
    * codegen predicate folded into conditional counts (no repeated scans;
    * the only shuffle is the single-row final aggregate), unpivoted with
    * `stack` into the funnel table. All stage thresholds are exact-integer
    * or IEEE-identical double comparisons, so the census is portable. */
  def qualityFunnel(spark: SparkSession, dir: String): DataFrame =
    qualityFunnelDf(Tables.documents(spark, dir))

  private[ops] def qualityFunnelDf(d: DataFrame): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    // mean word length: token chars = n_chars minus the (toks-1) spaces
    val avgLen = (col("n_chars") - (toks - lit(1L))).cast("double") /
      toks.cast("double")
    val p1 = col("n_chars").between(200L, 20000L)
    val p2 = p1 && toks >= 30L
    val p3 = p2 && avgLen.between(3.0, 12.0)
    d.agg(count(lit(1)).as("c0"), count(when(p1, 1)).as("c1"),
        count(when(p2, 1)).as("c2"), count(when(p3, 1)).as("c3"))
      .select(expr("stack(4, 's0_total', c0, 's1_chars', c1, " +
        "'s2_tokens', c2, 's3_avg_word_len', c3) AS (stage, n_docs)"))
      .sortSmall(col("stage"))
  }

  val qualityFunnelSql: String =
    """WITH s AS (
      |  SELECT n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents),
      |a AS (
      |  SELECT n_chars, toks,
      |    CAST(n_chars - (toks - 1) AS DOUBLE) / CAST(toks AS DOUBLE) AS avg_len
      |  FROM s)
      |SELECT 's0_total' AS stage, COUNT(*) AS n_docs FROM a
      |UNION ALL SELECT 's1_chars', COUNT(*) FROM a
      |  WHERE n_chars BETWEEN 200 AND 20000
      |UNION ALL SELECT 's2_tokens', COUNT(*) FROM a
      |  WHERE n_chars BETWEEN 200 AND 20000 AND toks >= 30
      |UNION ALL SELECT 's3_avg_word_len', COUNT(*) FROM a
      |  WHERE n_chars BETWEEN 200 AND 20000 AND toks >= 30
      |    AND avg_len BETWEEN 3.0 AND 12.0
      |ORDER BY stage""".stripMargin

  /** Per-mille keep rates for the deterministic source mixture (per-lang
    * upsample/downsample weights a pretraining mix prescribes). */
  private[ops] val MixtureRates: Seq[(String, Int)] =
    Seq("en" -> 1000, "es" -> 500, "de" -> 250, "fr" -> 100, "zh" -> 50)

  /** Deterministic weighted mixture sampling: per-lang keep rates applied
    * by multiplicative hashing of the stable doc id (NOT rand(): reruns,
    * retries, and engines must agree doc-by-doc), plus the achieved-rate
    * census a pipeline logs against its target mix. Constants bound:
    * |doc_id| ≤ ~3.4e9 keeps doc_id*2654435761 inside BIGINT (ANSI-safe);
    * the census itself is one map-side-combined aggregate. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureSampleDf(Tables.documents(spark, dir))

  private[ops] def mixtureSampleDf(d: DataFrame): DataFrame = {
    val rate = MixtureRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    val bucket = pmod(col("doc_id") * lit(2654435761L) + lit(97L), lit(1000L))
    d.withColumn("kept", (bucket < rate).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
        (sum(col("kept")).cast("double") / count(lit(1)).cast("double"))
          .as("achieved_rate"))
      .sortSmall(col("lang"))
  }

  /** End-to-end composite: exact dedup (keep the minimum doc id per
    * distinct text) → length filter → deterministic split census — the
    * three stages chained the way a real corpus build runs them. One
    * grouped shuffle on the text key, then per-row hashing and one tiny
    * census aggregate; duplicate texts share n_chars by construction, so
    * min(n_chars) is the survivor's length. */
  def dedupFilterSplit(spark: SparkSession, dir: String): DataFrame =
    dedupFilterSplitDf(Tables.documents(spark, dir))

  private[ops] def dedupFilterSplitDf(d: DataFrame): DataFrame = {
    val canon = d.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_chars")).as("n_chars"))
      .filter(col("n_chars") >= 200L)
    val bucket = pmod(col("doc_id") * lit(115249L) + lit(33391L), lit(10L))
    canon.withColumn("split",
        when(bucket < 8, lit("train")).when(bucket === 8, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .sortSmall(col("split"))
  }

  val dedupFilterSplitSql: String =
    """WITH canon AS (
      |  SELECT MIN(doc_id) AS doc_id, MIN(n_chars) AS n_chars
      |  FROM documents GROUP BY text),
      |f AS (SELECT * FROM canon WHERE n_chars >= 200)
      |SELECT CASE WHEN ((doc_id*115249+33391) % 10 + 10) % 10 < 8 THEN 'train'
      |            WHEN ((doc_id*115249+33391) % 10 + 10) % 10 = 8 THEN 'val'
      |            ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM f GROUP BY 1 ORDER BY split""".stripMargin

  val mixtureSampleSql: String =
    """WITH k AS (
      |  SELECT lang,
      |    CASE WHEN ((doc_id*2654435761+97) % 1000 + 1000) % 1000 <
      |      CASE lang WHEN 'en' THEN 1000 WHEN 'es' THEN 500
      |                WHEN 'de' THEN 250 WHEN 'fr' THEN 100
      |                WHEN 'zh' THEN 50 ELSE 0 END
      |    THEN 1 ELSE 0 END AS kept
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  CAST(SUM(kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS achieved_rate
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  /** Token-length bucket histogram — the planning pass a sequence-packing
    * stage runs before choosing context-window layout: docs bucketed by
    * power-of-2 token-count ranges (CASE ladder, integer-only — no log2
    * transcendental, so both engines agree exactly), with per-bucket doc
    * and token totals. Per-row codegen + one map-side-combined aggregate
    * over ≤ 6 groups: embarrassingly parallel at any scale. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " "))
    val bucket = when(n < 32, 0).when(n < 64, 32).when(n < 128, 64)
      .when(n < 256, 128).when(n < 512, 256).otherwise(512)
    Tables.documents(spark, dir)
      .select(bucket.cast("long").as("bucket_lo"), n.cast("long").as("n_tokens"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .sortSmall(col("bucket_lo"))
  }

  val lengthBucketsSql: String =
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
      |SELECT CAST(CASE WHEN n < 32 THEN 0 WHEN n < 64 THEN 32
      |            WHEN n < 128 THEN 64 WHEN n < 256 THEN 128
      |            WHEN n < 512 THEN 256 ELSE 512 END AS BIGINT) AS bucket_lo,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  MAX(n) AS max_tokens
      |FROM t GROUP BY 1 ORDER BY bucket_lo""".stripMargin

  /** Exact stratified sampling: within every lang stratum, take EXACTLY
    * ⌈20%⌉ of documents, chosen by ranking on a stateless multiplicative
    * hash of doc_id (same portability rules as `hashSplit` — no rand(),
    * no engine RNG). Unlike `DataFrame.sample` (Bernoulli per row:
    * approximate counts, seed-and-partitioning dependent), ranked-hash
    * sampling is reproducible across engines, runs, AND cluster layouts,
    * which is what a training-mixture spec needs. One exchange on the
    * stratum key; the rank and the stratum size come from the same window
    * partitioning (no second shuffle, no join back). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val hv = (col("doc_id") * lit(2654435761L) + lit(12345L)) % lit(1000000007L)
    val byLang = Window.partitionBy(col("lang"))
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("hv", hv)
      .withColumn("rn", row_number().over(byLang.orderBy(col("hv"), col("doc_id"))))
      .withColumn("n_total", count(lit(1)).over(byLang))
    d.filter(col("rn") <= expr("(n_total + 4) div 5"))
      .groupBy(col("lang"))
      .agg(max(col("n_total")).as("n_docs"),
        count(lit(1)).as("n_sample"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        sum(col("n_chars")).cast("long").as("sample_chars"))
      .sortSmall(col("lang"))
  }

  /** Data-quality constraint report (the Deequ-style validation gate a
    * pipeline runs before consuming a drop): completeness, key
    * uniqueness, value bounds, domain membership, and referential
    * integrity — emitted as one (constraint, metric, passed) row each.
    * All scalar metrics but uniqueness come from one FLAT pass over the
    * fact table (map-side partials, no data-sized exchange); the
    * distinct-key count runs as its own keys-only subtree; the
    * referential check is a key-only anti-join against orders. The
    * uniqueness constraint genuinely FAILS on this corpus
    * ((l_orderkey, l_linenumber) repeats) — a report that can only say
    * "passed" tests nothing. */
  def qualityConstraints(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // r20 split (guide §2.3 — shuffle fewer bytes): the key-pair grouped
    // shape shipped EVERY fact row through the exchange carrying six agg
    // buffers (the PK is unique, so map-side combine compressed nothing)
    // and then folded the data-sized grouped table again. Split instead:
    // every metric except uniqueness rides a FLAT aggregate (map-side
    // partials → ~1 row per input partition, no data-sized exchange at
    // all), and the uniqueness count alone pays a keys-only distinct
    // (16 B/row vs ~60 B/row grouped). Second scan of the fact table
    // < the fat exchange both here (0.714 → 0.479 s min-of-5, sf0.1)
    // and at 100 TB (scan is embarrassingly parallel; the exchange is
    // the scale chokepoint, §2.2). The countDistinct-next-to-plain-aggs
    // EXPAND trap (2× input rows) is still designed out — the distinct
    // runs in its own subtree.
    val flat = li
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_discount"))
      .join(broadcast(Tables.orders(spark, dir).select(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_returnflag").isNotNull, 1L).otherwise(0L)).as("nn_flag"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_discount")).as("max_disc"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
          .as("n_dom"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_orphans"))
    val npk = li.select(col("l_orderkey"), col("l_linenumber"))
      .distinct().agg(count(lit(1)).as("n_pk"))
    // join-free 1-row ⊕ 1-row assembly (the r20 union fold — a crossJoin
    // here plans as BroadcastNestedLoopJoin, which PlanAuditSpec forbids
    // inventory-wide)
    val cols = Seq("n", "nn_flag", "min_qty", "max_disc", "n_dom",
      "n_orphans", "n_pk")
    def pad(df: DataFrame, own: Seq[String]) =
      df.select(cols.map(c =>
        if (own.contains(c)) col(c) else lit(null).as(c)): _*)
    pad(flat, cols.filterNot(_ == "n_pk"))
      .unionByName(pad(npk, Seq("n_pk")))
      .agg(max(col("n")).as("n"), max(col("nn_flag")).as("nn_flag"),
        max(col("min_qty")).as("min_qty"), max(col("max_disc")).as("max_disc"),
        max(col("n_dom")).as("n_dom"), max(col("n_orphans")).as("n_orphans"),
        max(col("n_pk")).as("n_pk"))
      .select(expr(
        """stack(6,
          |'completeness_returnflag', cast(nn_flag as double) / n, nn_flag = n,
          |'unique_orderkey_linenumber', cast(n_pk as double) / n, n_pk = n,
          |'min_quantity_ge_1', cast(min_qty as double), min_qty >= 1.0,
          |'max_discount_le_0.1', cast(max_disc as double), max_disc <= 0.1,
          |'returnflag_in_domain', cast(n_dom as double) / n, n_dom = n,
          |'ref_integrity_orders', cast(n_orphans as double), n_orphans = 0
          |) as (constraint_name, metric, passed)""".stripMargin))
      .sortSmall(col("constraint_name"))
  }

  val qualityConstraintsSql: String =
    """WITH m AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END) AS nn_flag,
      |    COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
      |    MIN(l_quantity) AS min_qty,
      |    MAX(l_discount) AS max_disc,
      |    SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS n_dom
      |  FROM lineitem),
      |o AS (
      |  SELECT COUNT(*) AS n_orphans FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)),
      |r AS (
      |  SELECT 'completeness_returnflag' AS constraint_name,
      |    CAST(nn_flag AS DOUBLE) / n AS metric, nn_flag = n AS passed
      |  FROM m, o
      |  UNION ALL SELECT 'unique_orderkey_linenumber',
      |    CAST(n_pk AS DOUBLE) / n, n_pk = n FROM m, o
      |  UNION ALL SELECT 'min_quantity_ge_1',
      |    CAST(min_qty AS DOUBLE), min_qty >= 1.0 FROM m, o
      |  UNION ALL SELECT 'max_discount_le_0.1',
      |    CAST(max_disc AS DOUBLE), max_disc <= 0.1 FROM m, o
      |  UNION ALL SELECT 'returnflag_in_domain',
      |    CAST(n_dom AS DOUBLE) / n, n_dom = n FROM m, o
      |  UNION ALL SELECT 'ref_integrity_orders',
      |    CAST(n_orphans AS DOUBLE), n_orphans = 0 FROM m, o)
      |SELECT constraint_name, metric, passed FROM r ORDER BY constraint_name""".stripMargin

  val stratifiedSampleSql: String =
    """WITH r AS (
      |  SELECT lang, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY (doc_id*2654435761+12345) % 1000000007, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n_total
      |  FROM documents)
      |SELECT lang, MAX(n_total) AS n_docs, COUNT(*) AS n_sample,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
      |  CAST(SUM(n_chars) AS BIGINT) AS sample_chars
      |FROM r WHERE rn <= (n_total + 4) // 5
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic WEIGHTED Bernoulli sampling — the mixture-reweighting
    * primitive (upsample long documents, downsample boilerplate) every
    * pretraining data recipe applies. Each length tier gets an inclusion
    * probability w/8 (long 7/8, medium 4/8, short 1/8) and a row keeps
    * iff pmod(hash(doc_id), 8) < w — integer multiplicative hashing, NOT
    * rand(): reruns, retries, and both engines agree row-for-row, and at
    * 100 TB the decision is a per-row expression inside the scan (no
    * shuffle, no sampled-id ledger to join back). Differs from
    * [[stratifiedSample]] (fixed per-stratum FRACTION via rank) in that
    * the rate varies per ROW property — the two compose: stratify by
    * lang, weight by quality, in one pass. Output is the per-(lang, tier)
    * acceptance census a pipeline logs to audit realized vs target
    * rates. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSampleDf(Tables.documents(spark, dir))

  private[ops] def weightedSampleDf(d: DataFrame): DataFrame = {
    val tiered = d.withColumn("tier",
        when(col("n_chars") >= 450, lit("long"))
          .when(col("n_chars") >= 250, lit("medium"))
          .otherwise(lit("short")))
      .withColumn("w",
        when(col("tier") === "long", lit(7L))
          .when(col("tier") === "medium", lit(4L)).otherwise(lit(1L)))
      .withColumn("keep",
        pmod(col("doc_id") * lit(2654435761L) + lit(40507L), lit(8L)) < col("w"))
    tiered.groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), lit(1))).as("n_sampled"),
        sum(when(col("keep"), col("n_chars"))).as("sampled_chars"),
        max(col("w")).as("target_w"))
      .sortSmall(col("lang"), col("tier"))
  }

  // Sign-safe pmod twin, like hashSplitSql.
  val weightedSampleSql: String =
    """WITH t AS (
      |  SELECT lang, doc_id, n_chars,
      |    CASE WHEN n_chars >= 450 THEN 'long'
      |         WHEN n_chars >= 250 THEN 'medium' ELSE 'short' END AS tier,
      |    CASE WHEN n_chars >= 450 THEN 7
      |         WHEN n_chars >= 250 THEN 4 ELSE 1 END AS w
      |  FROM documents),
      |k AS (
      |  SELECT lang, tier, w, n_chars,
      |    ((doc_id*2654435761+40507) % 8 + 8) % 8 < w AS keep
      |  FROM t)
      |SELECT lang, tier, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN keep THEN 1 END) AS n_sampled,
      |  CAST(SUM(CASE WHEN keep THEN n_chars END) AS BIGINT) AS sampled_chars,
      |  CAST(MAX(w) AS BIGINT) AS target_w
      |FROM k GROUP BY lang, tier ORDER BY lang, tier""".stripMargin

  private val DomainQuota = 30

  /** Per-domain quota capping — the anti-over-representation pass every
    * web-corpus recipe runs (C4/RefinedWeb-style: no single host may
    * contribute more than K documents). Selection inside a domain is by
    * multiplicative hash order, NOT doc_id order (which would bias toward
    * old crawls) and NOT rand() (irreproducible); the per-domain
    * ROW_NUMBER is the same WindowGroupLimit shape as every top-k —
    * rank-filter pushes below the window at scale, and the shuffle key is
    * the domain, with the hot-domain skew bounded by the quota itself.
    * Output is the per-source admission census plus the kept set's char
    * mass. */
  def domainQuota(spark: SparkSession, dir: String): DataFrame = {
    // doc_id is reduced mod p BEFORE the multiply: (p-1)·2654435761 ≈
    // 2.7e18 < 2^63, so the product can never wrap int64 in EITHER engine
    // at any doc_id (unreduced, doc_id ≳ 3.5e9 would silently wrap in
    // Spark while DuckDB promotes — divergent admission order). p is not a
    // power of two, so wrap-on-overflow is NOT harmless here the way it is
    // for weightedSample's mod-8 bucket. Values are unchanged for
    // doc_id < p (all test SFs).
    val w = Window.partitionBy(col("source"))
      .orderBy(pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L)
          + lit(97L), lit(1000000007L)),
        col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("rk") <= DomainQuota, 1)).as("n_kept"),
        sum(when(col("rk") <= DomainQuota, col("n_chars"))).as("kept_chars"),
        min(when(col("rk") <= DomainQuota, col("doc_id"))).as("min_kept_doc"))
      .sortSmall(col("source"))
  }

  val domainQuotaSql: String =
    s"""WITH r AS (
      |  SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY (((doc_id % 1000000007)*2654435761+97) % 1000000007
      |                  + 1000000007) % 1000000007, doc_id) AS rk
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN rk <= $DomainQuota THEN 1 END) AS n_kept,
      |  CAST(SUM(CASE WHEN rk <= $DomainQuota THEN n_chars END) AS BIGINT)
      |    AS kept_chars,
      |  MIN(CASE WHEN rk <= $DomainQuota THEN doc_id END) AS min_kept_doc
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  private val ChunkTokens = 64
  private val ChunkOverlap = 16
  private val ChunkStride = ChunkTokens - ChunkOverlap

  /** Overlapping-window document chunking manifest — the RAG/retrieval
    * ingestion shape: each document splits into 64-token chunks with a
    * 16-token overlap (stride 48). chunk count = 1 + ⌈max(n−C,0)/stride⌉
    * (every token is covered; the final chunk may be short). Emitted as a
    * MANIFEST (offsets, lengths, boundary tokens), not materialized chunk
    * text — at 100 TB the downstream embedder reads (doc, offset) spans
    * lazily; materializing overlapping text would write the corpus
    * 1.33× over. Plan: per-row `sequence` explode inside the scan —
    * linear, no shuffle before the final order. All integer arithmetic,
    * so the DuckDB range() twin matches exactly. */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        expr(s"1 + (greatest(n - $ChunkTokens, 0) + ${ChunkStride - 1}) " +
          s"div $ChunkStride"))
    d.select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_token", col("chunk_idx") * ChunkStride)
      .withColumn("chunk_len",
        least(lit(ChunkTokens), col("n") - col("start_token")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        col("chunk_len").cast("long").as("chunk_len"),
        element_at(col("toks"), (col("start_token") + 1).cast("int"))
          .as("first_token"),
        element_at(col("toks"),
          (col("start_token") + col("chunk_len")).cast("int")).as("last_token"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val docChunksSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n,
      |    unnest(range(0, 1 + (greatest(n - $ChunkTokens, 0) + $ChunkStride - 1)
      |      // $ChunkStride)) AS chunk_idx
      |  FROM d)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(chunk_idx * $ChunkStride AS BIGINT) AS start_token,
      |  CAST(least($ChunkTokens, n - chunk_idx * $ChunkStride) AS BIGINT) AS chunk_len,
      |  toks[chunk_idx * $ChunkStride + 1] AS first_token,
      |  toks[chunk_idx * $ChunkStride
      |    + least($ChunkTokens, n - chunk_idx * $ChunkStride)] AS last_token
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** Temperature-damped mixture weights per (source, lang) domain — the
    * sampling-weight computation behind every multilingual/multi-source
    * corpus recipe (Conneau & Lample 2019's α-scaled multinomial;
    * Pile/ROOTS-style domain mixing): raw count shares over-sample huge
    * domains, so each domain's weight is count^α renormalized. α = 1/2
    * DELIBERATELY: sqrt is an IEEE-754 correctly-rounded required op
    * (bit-identical in both engines), while a general count^0.7 routes
    * through exp/ln and can never cross-engine hash-match. The damped
    * score is immediately FLOORED into integer fixed-point
    * (⌊√n·10⁴⌋ — both engines evaluate the same double multiply and
    * floor), so renormalization is exact integer arithmetic: w_fp =
    * s_i·10⁶ div Σs_i. Output also carries the raw-share fixed-point so
    * the census SHOWS the damping (hugest domain's weight share < raw
    * share, smallest's >).
    *
    * Plan: one map-side-combined (source, lang) aggregate (domain-sized
    * output), then a broadcast 1-row total joined back — two stages at
    * any corpus size; the domain table is the small side by
    * construction. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val dom = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("s", floor(sqrt(col("n_docs")) * 10000).cast("long"))
    val tot = dom.agg(sum(col("s")).as("s_tot"),
      sum(col("n_docs")).as("n_tot"))
    dom.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
        expr("n_docs * 1000000 div n_tot").as("raw_share_fp"),
        expr("s * 1000000 div s_tot").as("weight_fp"))
      .sortSmall(col("source"), col("lang"))
  }

  val mixtureWeightsSql: String =
    """WITH dom AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |    CAST(FLOOR(sqrt(COUNT(*)) * 10000) AS BIGINT) AS s
      |  FROM documents GROUP BY source, lang),
      |tot AS (
      |  SELECT CAST(SUM(s) AS BIGINT) AS s_tot,
      |    CAST(SUM(n_docs) AS BIGINT) AS n_tot FROM dom)
      |SELECT source, lang, n_docs, n_chars,
      |  CAST(n_docs * 1000000 // n_tot AS BIGINT) AS raw_share_fp,
      |  CAST(s * 1000000 // s_tot AS BIGINT) AS weight_fp
      |FROM dom, tot ORDER BY source, lang""".stripMargin

  /** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) —
    * score every raw document by how target-like its token distribution
    * is, the pass that upsamples high-quality-domain-looking text when
    * composing a pretraining mixture. Target distribution: the `en`
    * slice of the corpus; raw distribution: the whole corpus.
    *
    * Deviation from the paper, for cross-engine exactness: DSIR weights
    * are Σ count·log(p_target/p_raw); a transcendental log can never
    * hash-match across engines (see agg_gini_impurity's rationale), so
    * the per-token contribution here is the LINEARIZED Laplace-smoothed
    * probability ratio in integer fixed point —
    * floor(10⁶ · (cnt_t+1)(tot_r+V) / ((cnt_r+1)(tot_t+V))) — monotone
    * in the same ratio, built from one exactly-rounded double divide.
    * Per-doc weight = Σ token_count · ratio_fp, exact BIGINT (per-doc
    * bound: tokens/doc × max ratio_fp ≪ 2⁶³ — a per-ROW quantity, per
    * the overflow rules in [[graft.ops]]).
    *
    * Scale posture: one token explode feeds both the vocab census and
    * the per-doc counts (persisted, like bigramLmScore's shared
    * explode); the vocab table is vocab-sized → broadcast to the scoring
    * join; totals are one constant-size broadcast cross join. No
    * all-pairs anywhere; the whole program is two map-side-combined
    * aggregates and one broadcast equi-join. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("cnt_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
    val tot = vocab.agg(count(lit(1)).as("v_sz"),
      sum(col("cnt_r")).as("tot_r"), sum(col("cnt_t")).as("tot_t"))
    // every operand is cast to DOUBLE before any multiply: a bare
    // `1000000.0` literal is DECIMAL in both engines (divergent decimal
    // division rules), and a BIGINT·BIGINT denominator would overflow at
    // corpus scale — all-double keeps each step one identically-rounded
    // IEEE op in both engines at any magnitude
    val ratio = vocab.crossJoin(broadcast(tot))
      .select(col("w"), expr(
        """cast(floor(1e6 * cast(cnt_t + 1 as double) * cast(tot_r + v_sz as double)
          |  / (cast(cnt_r + 1 as double) * cast(tot_t + v_sz as double))) as bigint)""".stripMargin)
        .as("ratio_fp"))
    toks.groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), "w")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("ratio_fp")).as("weight_fp"))
      .select(col("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("weight_fp").cast("long").as("weight_fp"),
        expr("weight_fp div n_tokens").cast("long").as("per_token_fp"))
      .orderBy(col("doc_id"))
  }

  /** Oracle twin: same census → smoothed ratio → scoring join program in
    * plain SQL; `//` keeps the per-token mean integer-exact. */
  val dsirWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |vocab AS (
      |  SELECT w, COUNT(*) AS cnt_r,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      |  FROM toks GROUP BY w),
      |tot AS (
      |  SELECT COUNT(*) AS v_sz, CAST(SUM(cnt_r) AS BIGINT) AS tot_r,
      |    CAST(SUM(cnt_t) AS BIGINT) AS tot_t FROM vocab),
      |ratio AS (
      |  SELECT w, CAST(FLOOR(1e6 * CAST(cnt_t + 1 AS DOUBLE) * CAST(tot_r + v_sz AS DOUBLE)
      |    / (CAST(cnt_r + 1 AS DOUBLE) * CAST(tot_t + v_sz AS DOUBLE))) AS BIGINT) AS ratio_fp
      |  FROM vocab, tot),
      |dc AS (
      |  SELECT doc_id, lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3)
      |SELECT dc.doc_id, dc.lang,
      |  CAST(SUM(dc.c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(dc.c * r.ratio_fp) AS BIGINT) AS weight_fp,
      |  CAST(SUM(dc.c * r.ratio_fp) // SUM(dc.c) AS BIGINT) AS per_token_fp
      |FROM dc JOIN ratio r USING (w)
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** Span-corruption manifest (T5-style denoising objective, Raffel et
    * al. 2020 §3.1.4): per document, deterministically select corruption
    * spans — a span starts at token position p when a (doc_id, p) hash
    * clears a 1-in-20 gate, and runs 1–3 tokens — and emit the masking
    * census (span count, masked-token count after overlap union, 10⁶
    * fixed-point mask ratio). The downstream trainer consumes exactly
    * such a manifest to build inputs/targets; hashing replaces the
    * paper's RNG so every engine, run, and layout derives the same
    * spans (the same derandomization as the sampling tiers).
    *
    * Scale posture: pure per-row array arithmetic inside the scan —
    * sequence/filter/transform/flatten/distinct build the span union
    * without exploding tokens into rows; no shuffle except the final
    * ORDER BY. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    d.withColumn("starts", expr(
        """filter(sequence(0, cast(n_tokens - 1 as int)),
          |  p -> (doc_id * 37 + p * 101) % 1000003 % 20 = 0)""".stripMargin))
      .withColumn("masked", expr(
        """size(array_distinct(flatten(transform(starts,
          |  p -> sequence(p, cast(least(p + (doc_id + p) % 3,
          |                             n_tokens - 1) as int))))))""".stripMargin)
        .cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        size(col("starts")).cast("long").as("n_spans"),
        col("masked").as("n_masked"),
        expr("n_masked * 1000000 div n_tokens").as("mask_ratio_fp"))
      .orderBy(col("doc_id"))
  }

  // k-anonymity threshold: a quasi-identifier group smaller than this is
  // a re-identification risk (Sweeney 2002's k).
  private val KAnon = 5L

  /** k-anonymity risk census (Sweeney 2002) over the release-shaped
    * quasi-identifiers (lang, source, n_chars÷100 length bucket): group
    * sizes, the at-risk flag (size < k), and — riding the same
    * aggregate via window totals — the share of the corpus that would
    * need suppression or generalization before release. The privacy
    * audit every dataset release runs after [[graft.ops.TextAnalysis]]'s
    * PII redaction: scrubbing direct identifiers does not stop a join
    * attack on quasi-identifiers; this census quantifies that residual
    * risk.
    *
    * Scale posture: one grouped count on the quasi-identifier key
    * (map-side combined); the corpus-wide totals are a 1-ROW AGGREGATE
    * of the group table broadcast-cross-joined back — NOT an
    * unpartitioned window: the census is domain-bounded today, but its
    * cardinality grows with the quasi-identifier domain at 100×, and a
    * `Window.partitionBy()` funnels it through one task, whereas the
    * broadcast scalar keeps every stage full-width at any domain size. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = g.agg(
      sum(when(col("n") < KAnon, col("n")).otherwise(0L)).as("risky_total"),
      sum(col("n")).as("total"))
    g.withColumn("at_risk", col("n") < KAnon)
      .crossJoin(broadcast(totals))
      .select(col("lang"), col("source"), col("len_bucket"), col("n"),
        col("at_risk"),
        // integer div, not `/`: Column./ is always DOUBLE division
        expr("risky_total * 1000000 div total").cast("long")
          .as("risk_share_fp"))
      .sortSmall(col("lang"), col("source"), col("len_bucket"))
  }

  /** Oracle twin: same census; the corpus-wide shares come from a 1-row
    * totals aggregate cross-joined back, exactly as in the Spark plan. */
  val kAnonymitySql: String =
    s"""WITH g AS (
      |  SELECT lang, source, n_chars // 100 AS len_bucket, COUNT(*) AS n
      |  FROM documents GROUP BY 1, 2, 3),
      |t AS (
      |  SELECT SUM(CASE WHEN n < $KAnon THEN n ELSE 0 END) AS risky_total,
      |    SUM(n) AS total
      |  FROM g)
      |SELECT lang, source, len_bucket, n, n < $KAnon AS at_risk,
      |  CAST(risky_total * 1000000 // total AS BIGINT) AS risk_share_fp
      |FROM g, t ORDER BY lang, source, len_bucket""".stripMargin

  /** Oracle twin: the same hash gate and span union with DuckDB list
    * lambdas (`range` is end-exclusive where Spark's `sequence` is
    * inclusive — hence the `+ 1`s). */
  val spanCorruptionSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, n_tokens,
      |    list_filter(range(0, n_tokens),
      |      p -> (doc_id * 37 + p * 101) % 1000003 % 20 = 0) AS starts
      |  FROM d)
      |SELECT doc_id, lang, n_tokens,
      |  CAST(len(starts) AS BIGINT) AS n_spans,
      |  CAST(len(list_distinct(flatten(list_transform(starts,
      |    p -> range(p, least(p + (doc_id + p) % 3, n_tokens - 1) + 1)))))
      |    AS BIGINT) AS n_masked,
      |  CAST(CAST(len(list_distinct(flatten(list_transform(starts,
      |    p -> range(p, least(p + (doc_id + p) % 3, n_tokens - 1) + 1)))))
      |    AS BIGINT) * 1000000 // n_tokens AS BIGINT) AS mask_ratio_fp
      |FROM s ORDER BY doc_id""".stripMargin
}
