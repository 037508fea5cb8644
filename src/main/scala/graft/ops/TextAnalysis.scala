package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Text-analysis inventory (north-star extensions): token statistics,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * Everything is per-row expression work inside whole-stage codegen — the
  * shape that scales embarrassingly (no shuffle except final aggregation).
  * Ratios are computed as single double divisions over exact integers so
  * both engines agree bit-for-bit; transcendentals are avoided.
  */
object TextAnalysis {

  /** Per-document token statistics from the raw text. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"),
        col("n_chars"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        expr("cast(array_max(transform(toks, t -> length(t))) as int)").as("max_token_len"),
        expr("cast(array_min(transform(toks, t -> length(t))) as int)").as("min_token_len"),
        (expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)")
          .cast(DoubleType) / size(col("toks")).cast(DoubleType)).as("avg_token_len"))
      .orderBy(col("doc_id"))
  }

  val tokenStatsSql: String =
    """SELECT doc_id, lang, n_chars,
      |  CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_distinct_tokens,
      |  CAST(list_max(list_transform(string_split(text,' '), t -> length(t))) AS INTEGER) AS max_token_len,
      |  CAST(list_min(list_transform(string_split(text,' '), t -> length(t))) AS INTEGER) AS min_token_len,
      |  CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE)
      |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Heuristic quality score in [0,1]: lexical diversity, token-count
    * saturation, and an all-integer-arithmetic blend — the shape of
    * LLM-corpus quality filters (length/ratio features), kept
    * SQL-portable. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val withFeats = d
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast(DoubleType).as("n_tokens"),
        size(array_distinct(col("toks"))).cast(DoubleType).as("n_distinct"))
    withFeats.select(
        col("doc_id"), col("lang"),
        (col("n_distinct") / col("n_tokens")).as("diversity"),
        least(col("n_tokens") / lit(100.0), lit(1.0)).as("len_saturation"),
        round((col("n_distinct") / col("n_tokens")) * 0.6 +
          least(col("n_tokens") / lit(100.0), lit(1.0)) * 0.4, 6).as("quality"))
      .withColumn("tier",
        when(col("quality") >= 0.7, "high")
          .when(col("quality") >= 0.4, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String =
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text,' ')) AS DOUBLE) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) AS n_distinct
      |  FROM documents)
      |SELECT doc_id, lang,
      |  n_distinct / n_tokens AS diversity,
      |  least(n_tokens / 100.0, 1.0) AS len_saturation,
      |  round((n_distinct / n_tokens) * 0.6 + least(n_tokens / 100.0, 1.0) * 0.4, 6) AS quality,
      |  CASE WHEN round((n_distinct / n_tokens) * 0.6 + least(n_tokens / 100.0, 1.0) * 0.4, 6) >= 0.7 THEN 'high'
      |       WHEN round((n_distinct / n_tokens) * 0.6 + least(n_tokens / 100.0, 1.0) * 0.4, 6) >= 0.4 THEN 'medium'
      |       ELSE 'low' END AS tier
      |FROM f ORDER BY doc_id""".stripMargin

  /** Character-n-gram language-ID heuristic: vowel ratio + marker-token
    * hits, reduced to a deterministic guess, scored against the labeled
    * `lang` column. (The corpus is synthetic word soup, so the point is
    * the operator shape — per-row featurize → classify → evaluate — not
    * linguistic accuracy.) */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val feat = d.select(col("doc_id"), col("lang"),
      (length(regexp_replace(col("text"), "[^aeiou]", "")).cast(DoubleType) /
        length(regexp_replace(col("text"), " ", "")).cast(DoubleType)).as("vowel_ratio"),
      (length(col("text")).cast(DoubleType) /
        size(split(col("text"), " ")).cast(DoubleType)).as("chars_per_token"))
    feat.select(col("doc_id"), col("lang"),
        round(col("vowel_ratio"), 6).as("vowel_ratio"),
        round(col("chars_per_token"), 6).as("chars_per_token"),
        when(col("vowel_ratio") >= 0.5, "vocalic")
          .when(col("vowel_ratio") >= 0.35, "balanced")
          .otherwise("consonantal").as("guessed_class"))
      .orderBy(col("doc_id"))
  }

  val languageIdSql: String =
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE) /
      |      CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS vowel_ratio,
      |    CAST(length(text) AS DOUBLE) /
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS chars_per_token
      |  FROM documents)
      |SELECT doc_id, lang,
      |  round(vowel_ratio, 6) AS vowel_ratio,
      |  round(chars_per_token, 6) AS chars_per_token,
      |  CASE WHEN vowel_ratio >= 0.5 THEN 'vocalic'
      |       WHEN vowel_ratio >= 0.35 THEN 'balanced'
      |       ELSE 'consonantal' END AS guessed_class
      |FROM f ORDER BY doc_id""".stripMargin

  /** Rolling polynomial fingerprint (Karp-Rabin style) over the document
    * characters: fold (acc*31 + code) mod 1e9+7, as the codegen'd custom
    * Expression [[graft.functions.PolyHash64]]. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    // Native codegen rolling hash (graft_poly_hash): one tight byte loop
    // per row vs the declarative sequence/transform/aggregate chain that
    // allocated three arrays per row through the boxed lambda path —
    // ~5× on this query; the declarative twin stays pinned bit-for-bit
    // in PolyHashSpec (and the DuckDB oracle re-derives per character).
    graft.functions.GraftFunctions.register(spark)
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"),
        expr("graft_poly_hash(text)").as("fingerprint"),
        length(col("text")).as("n_chars_computed"))
      .orderBy(col("doc_id"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(7 AS BIGINT),
      |      list_transform(range(1, length(text)+1),
      |        i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
      |  CAST(length(text) AS INTEGER) AS n_chars_computed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Top-k token frequencies via the custom SpaceSaving sketch aggregate
    * (graft.functions.SpaceSavingTopK): single pass, fixed memory, one
    * serialized sketch per partition on the shuffle — the 100 TB
    * heavy-hitters path.
    *
    * Capacity contract (capacity-literal audit): 128 counters against a
    * GENERATOR-FIXED 31-token vocabulary (SF-independent — the testdata
    * text draws from a closed token set, pinned by ScalePolicySpec), so
    * the sketch is EXACT here and the oracle is a plain COUNT(*). This
    * is not the simhash-cap class: vocabulary does not grow with the
    * corpus, so the literal cannot saturate on this data. On an open
    * vocabulary the exactness claim is the first casualty and the
    * failure is LOUD (the oracle COUNT(*) diverges), not silent — the
    * sketch then only guarantees presence of keys with freq > N/128 and
    * overcounts by ≤ N/128 (Metwally Thm. 2-3), and capacity becomes a
    * precision knob to size ≫ k / skew, like CMS width. */
  private[ops] val TopkSketchCapacity = 128

  def topkSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = Tables.documents(spark, dir)
    d.select(explode(split(col("text"), " ")).as("token"))
      .agg(expr(s"graft_topk_sketch(token, $TopkSketchCapacity, 20)").as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.token").as("token"), col("s.n").as("n"))
      .sortSmall(col("n").desc, col("token"))
  }

  val topkSketchSql: String =
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** Per-language corpus rollup — the aggregate view of the text metrics. */
  def langProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("avg_chars"))
      .sortSmall(col("lang"))
  }

  val langProfileSql: String =
    """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(n_chars) AS min_chars,
      |  MAX(n_chars) AS max_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Regex-tokenizer census: alphanumeric-run tokens (the BPE-style
    * pre-tokenization split, vs the whitespace split `tokenStats` counts)
    * next to the whitespace count per lang. Pure per-row regexp work in
    * codegen + one map-side-combined aggregate. The pattern uses only
    * literal character classes, which Java and RE2-family engines match
    * identically — keep fancy regex features out of cross-engine paths. */
  def regexTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val rx = size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0)))
      .cast("long")
    val ws = size(split(col("text"), " ")).cast("long")
    d.select(col("lang"), rx.as("rt"), ws.as("wt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("rt")).as("regex_tokens"),
        sum(col("wt")).as("ws_tokens"),
        max(col("rt")).as("max_regex_tokens"))
      .sortSmall(col("lang"))
  }

  val regexTokensSql: String =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS rt,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(rt) AS BIGINT) AS regex_tokens,
      |  CAST(SUM(wt) AS BIGINT) AS ws_tokens,
      |  MAX(rt) AS max_regex_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Top character trigrams over the corpus via the custom `Generator`
    * expression `graft_char_ngrams` (graft.functions.CharNGrams): grams
    * STREAM out of each document row into partial aggregation with O(n)
    * live bytes per row — the declarative transform+explode materializes
    * a document-sized gram array first (see the Generator's Scaladoc).
    * One map-side-combined aggregate, then a bounded top-k. */
  def charTrigrams(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(expr("graft_char_ngrams(text, 3)").as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(20)
  }

  val charTrigramsSql: String =
    """WITH g AS (
      |  SELECT unnest(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INTEGER), 3))) AS gram
      |  FROM documents WHERE length(text) >= 3)
      |SELECT gram, COUNT(*) AS n FROM g
      |GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin

  /** Corpus-statistical LM scoring — the two-pass model-build + score
    * shape (a tiny n-gram language model trained on the corpus itself,
    * then applied back to every document): pass 1 aggregates the corpus
    * bigram frequency table; pass 2 joins each document's bigram
    * occurrences against it and averages. At 100 TB the model table is
    * corpus-sized (NOT broadcastable), so the score pass is a shuffle
    * equi-join on the bigram key — both sides come out of the same
    * persisted bigram explode, so the corpus is read once and the join
    * is partitioned on the key it aggregates by. All statistics are
    * integer counts; only the final average divides (double over exact
    * ints — bit-portable). */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(spark, dir)
      .repartition(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), " +
          "i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      // both the model aggregate and the score join read this — persist,
      // or the tokenize+explode runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = bi.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    bi.join(model, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("df")).cast("long").as("sum_df"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_df"),
        round(col("sum_df").cast(DoubleType) /
          col("n_bigrams").cast(DoubleType), 6).as("avg_bigram_freq"))
      .orderBy(col("doc_id"))
  }

  val bigramLmScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
      |  FROM toks WHERE len(t) >= 2),
      |model AS (SELECT bg, COUNT(*) AS df FROM bi GROUP BY bg)
      |SELECT b.doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(m.df) AS BIGINT) AS sum_df,
      |  round(CAST(SUM(m.df) AS DOUBLE) / COUNT(*), 6) AS avg_bigram_freq
      |FROM bi b JOIN model m USING (bg)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** PII redaction — the scrub pass every training corpus runs before any
    * text leaves the pipeline: regex-redact emails, US phone numbers, and
    * SSN-shaped ids, and count what was removed per document (the audit
    * trail). Patterns are deliberately RE2-safe (no lookaround, no
    * backreferences) so the same regex runs identically on Java's engine
    * and DuckDB's RE2 — the portability constraint any multi-engine scrub
    * spec has to respect. The corpus text is synthetic word-soup with no
    * PII, so the document under scrub is a deterministic contact string
    * derived from doc_id in BOTH engines (same construction rule), making
    * redaction correctness hash-checkable; on real data the same
    * expressions point at the text column. Pure per-row codegen — no
    * shuffle except the output sample's final sort. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), expr(
        "concat('contact user', doc_id, '@corp.example.com or call 415-555-', " +
          "lpad(cast((doc_id * 7919) % 10000 as string), 4, '0'), " +
          "' ssn ', lpad(cast((doc_id % 900) + 100 as string), 3, '0'), '-', " +
          "lpad(cast((doc_id * 31) % 100 as string), 2, '0'), '-', " +
          "lpad(cast((doc_id * 97) % 10000 as string), 4, '0'), ' end')").as("raw"))
      .select(col("doc_id"),
        // Column-form regexp functions (not expr() SQL strings): a Spark
        // single-quoted SQL literal eats the `\` in `\.`, silently turning
        // the dot-escape into match-any; lit() passes the pattern verbatim.
        size(regexp_extract_all(col("raw"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("raw"), lit(ssn), lit(0)))
          .cast("long").as("n_ssns"),
        regexp_replace(regexp_replace(regexp_replace(col("raw"),
          lit(email), lit("<EMAIL>")),
          lit(phone), lit("<PHONE>")),
          lit(ssn), lit("<SSN>")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  val piiRedactSql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    s"""WITH raw AS (
      |  SELECT doc_id,
      |    'contact user' || doc_id || '@corp.example.com or call 415-555-' ||
      |    lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0') ||
      |    ' ssn ' || lpad(CAST((doc_id % 900) + 100 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST((doc_id * 31) % 100 AS VARCHAR), 2, '0') || '-' ||
      |    lpad(CAST((doc_id * 97) % 10000 AS VARCHAR), 4, '0') || ' end' AS raw
      |  FROM documents WHERE doc_id % 10 = 0)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '$email')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '$phone')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(raw, '$ssn')) AS BIGINT) AS n_ssns,
      |  regexp_replace(regexp_replace(regexp_replace(raw,
      |    '$email', '<EMAIL>', 'g'),
      |    '$phone', '<PHONE>', 'g'),
      |    '$ssn', '<SSN>', 'g') AS redacted
      |FROM raw ORDER BY doc_id""".stripMargin
  }

  /** Count-min sketch token frequencies (Cormode/Muthukrishnan 2005):
    * estimate the top-20 tokens' corpus counts from a 4×4096 counter
    * sketch built in ONE bounded-memory aggregate pass — the frequency
    * table for vocabularies too large to hold exactly. Checked the sketch
    * way ([[Aggregations.approxDistinct]] pattern): exact counts plus two
    * deterministic booleans — `est_ge_exact` (count-min is one-sided BY
    * CONSTRUCTION: an estimate below the true count is impossible, so
    * this pins the implementation, not luck) and `est_within_bound`
    * (overestimate ≤ ⌈e·N/width⌉, the paper's ε·N bound). The sketch
    * bytes collect once (fenced CONSTANT-size: 128 KiB whatever the
    * corpus, same pattern as the bloom literal in [[RuntimeFilter]]) and
    * the codegen `graft_cms_estimate` probes inline over the tiny top-k
    * table.
    *
    * Capacity-literal audit: the 4×4096 shape is a PRECISION knob, not a
    * capacity — the error bound the output asserts (⌈e·N/width⌉) is
    * CORPUS-DERIVED, scaling with N by construction, so the sketch
    * cannot silently saturate: if width ever became too narrow for the
    * vocabulary's collision load, `est_within_bound` flips false and the
    * oracle (which expects TRUE) fails the driver gate. Self-detecting —
    * no separate liveness entry needed. */
  def cmsTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val row = toks.agg(
        call_function("graft_cms_build", xxhash64(col("token")),
          lit(4), lit(4096)).as("cms"),
        count(lit(1)).as("n_total"))
      .head()
    val cms = row.getAs[Array[Byte]](0)
    val bound = math.ceil(math.E * row.getAs[Long](1) / 4096.0).toLong
    toks.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token"))
      .limit(20)
      .withColumn("est",
        call_function("graft_cms_estimate", lit(cms), xxhash64(col("token"))))
      .select(col("token"), col("exact_n"),
        (col("est") >= col("exact_n")).as("est_ge_exact"),
        (col("est") - col("exact_n") <= bound).as("est_within_bound"))
      .sortSmall(col("exact_n").desc, col("token"))
  }

  val cmsTokenCountsSql: String =
    """SELECT token, COUNT(*) AS exact_n,
      |  TRUE AS est_ge_exact, TRUE AS est_within_bound
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY exact_n DESC, token LIMIT 20""".stripMargin

  /** TF-IDF top terms: the 3 highest-scoring tokens per document.
    * tf = in-doc term count; df = documents containing the token; the idf
    * factor is the FIXED-POINT rational (N·10⁶) div df — integer
    * arithmetic, so scores are bit-identical across engines (a log-idf is
    * the same ranking through a monotone map, but transcendentals never
    * cross-engine hash-match; see the PageRank precedent in
    * [[graft.ops.Graph]]).
    * Plan: one explode → (doc,token) count (map-side combined) → token df
    * aggregate (vocabulary-sized, BROADCAST back — Zipf keeps vocabularies
    * millions, not billions, at 100 TB) → per-doc top-3 via
    * WindowGroupLimit (rank filter keeps 3 rows per doc before the window
    * shuffle). The corpus shuffles once, on (doc,token). */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // Partition the exploded tokens by doc_id ONCE: hash on doc_id (a
    // subset of the tf grouping key) clusters (doc, token), so the tf
    // aggregate, the broadcast-join projection, and the per-doc rank
    // window all ride a single exchange — the df branch reuses it too
    // (ReusedExchange) before its own vocabulary-sized shuffle.
    val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("token"))
    tf.join(broadcast(df_), "token")
      .crossJoin(broadcast(n))
      .withColumn("score_fp", expr("tf * ((n_docs * 1000000) div df)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tf"), col("df"),
        col("score_fp"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val tfidfTopTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
      |df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, token, tf, df,
      |    tf * ((n_docs * 1000000) // df) AS score_fp,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |                       ORDER BY tf * ((n_docs * 1000000) // df) DESC,
      |                                token) AS rk
      |  FROM tf JOIN df USING (token), n)
      |SELECT doc_id, rk, token, tf, df, score_fp
      |FROM scored WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** BM25 retrieval (Robertson & Zaragoza 2009, k1=1.2 b=0.75): score the
    * corpus against a fixed 3-term query and return the top-20 documents.
    * The retrieval twin of [[tfidfTopTerms]] (which ranks terms per doc);
    * together they are the classic offline search-indexing pair an LLM
    * data pipeline runs for corpus curation / retrieval-eval.
    *
    * Cross-engine exactness: BM25's idf is log((N-df+0.5)/(df+0.5)+1) — a
    * transcendental that can never hash-match across engines — so the idf
    * here is the same Robertson/Spärck-Jones odds RATIO without the log,
    * in fixed point: ((2N-2df+1)·10³) div (2df+1). The log is a monotone
    * map of this ratio, so per-term ranking is unchanged; the additive
    * blend weights rare terms more sharply than log-idf, which for a
    * fixed-query top-k is the same family of ranking. The tf saturation
    * term tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) is made rational via the
    * PRE-REDUCED fixed point A = (10·total_len) div N (= 10·avgdl,
    * floored — one deterministic floor both engines compute identically),
    * multiplying through by A: num = 22·A·tf·10³, den = 10·A·tf + 3·A +
    * 90·dl. The overflow bound is now CORPUS-SIZE-INDEPENDENT: peak
    * ≈ 2.2·10⁴·avgdl·tf requires avgdl·tf < 4×10¹³ — document-scale
    * quantities (a 10⁵-token average × a 10⁸-occurrence tf still fits
    * int64), unlike the naive 10·total_len multiplier whose numerator
    * wraps at total_len ~10¹³ tokens with tf ≥ ~42.
    *
    * Plan: ONE corpus scan emits (doc, dl, query-term hit) with the
    * filter INSIDE the explode lambda — non-query tokens never leave the
    * scan, so the exploded stream is |Q|-bounded per doc, not dl-bounded.
    * tf → (vocab-sized) df broadcast back, corpus-stats broadcast, top-20
    * via TakeOrderedAndProject (no global sort). At 100 TB the only
    * shuffle is the (doc,term) tf aggregate, map-side combined. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val hits = d
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(expr(
          "filter(toks, t -> array_contains(array('dup','spark','merge'), t))"))
          .as("token"))
    val tf = hits.groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = d.select(size(split(col("text"), " ")).as("dl0"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl0")).as("total_len"))
    tf.join(broadcast(dfT), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf_fp",
        expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .withColumn("a10", expr("(10 * total_len) div n_docs"))
      .withColumn("tf_fp",
        expr("(22 * a10 * tf * 1000) div (10 * a10 * tf + 3 * a10 + 90 * dl)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(expr("idf_fp * tf_fp")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(20)
  }

  val bm25TopKSql: String =
    """WITH hits AS (
      |  SELECT doc_id, len(string_split(text,' ')) AS dl,
      |    unnest(list_filter(string_split(text,' '),
      |      t -> list_contains(['dup','spark','merge'], t))) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl, token, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |stats AS (SELECT COUNT(*) AS n_docs,
      |  CAST((10 * SUM(len(string_split(text,' ')))) // COUNT(*) AS BIGINT)
      |    AS a10 FROM documents),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_hit_terms,
      |    SUM( (((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1))
      |       * ((22 * a10 * tf * 1000) //
      |          (10 * a10 * tf + 3 * a10 + 90 * dl)) )
      |      AS score_fp
      |  FROM tf JOIN df USING (token), stats GROUP BY doc_id)
      |SELECT doc_id, n_hit_terms,
      |  CAST(score_fp AS BIGINT) AS score_fp
      |FROM scored ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin

  private val BpeRounds = 3 // unrolled merge rounds (round 1 = Sennrich init)
  private val BpeTopK = 10  // pairs emitted per round

  /** BPE merge-round census (Sennrich/Haddow/Birch, "Neural machine
    * translation of rare words with subword units", ACL 2016): the
    * tokenizer-induction step of a real LLM data pipeline. Each round
    * counts adjacent-symbol pairs over the corpus, emits the top-K, and
    * merges the single most frequent pair (count desc, then
    * lexicographically smallest) into one symbol before the next round —
    * three rounds unrolled, so the output shows the merge dynamics (the
    * winning pair disappears from the next round's census).
    *
    * Scale shape — the standard word-frequency compression: the corpus is
    * scanned ONCE for the word census; everything after runs on the
    * VOCAB-sized (word, freq) table, with pair counts weighted by word
    * frequency — at 100 TB the vocab is millions of rows while the corpus
    * is trillions of tokens, so the per-round work is negligible and
    * map-side-combines on the pair key. Per-round state is ONE broadcast
    * row (the winning pair), applied as a narrow per-row string rewrite.
    *
    * Symbol sequences are SOH/STX-delimited symbols (chr 1 / chr 2)
    * joined by spaces, so the merge is a plain `replace` of
    * "⟨x⟩ ⟨y⟩" with "⟨xy⟩" — both engines scan left-to-right over
    * non-overlapping occurrences, which is exactly BPE's greedy in-word
    * merge order, and the markers make a cross-symbol-boundary false
    * match impossible. All counts are integers; no rounding anywhere. */
  private val bpeStripL = expr("replace(replace(l, chr(1), ''), chr(2), '')")
  private val bpeStripR = expr("replace(replace(r, chr(1), ''), chr(2), '')")

  /** Initial symbol table: one row per distinct word -- (w, seq, freq),
    * seq = space-joined SOH/STX-marked single characters. */
  private def bpeWordSeqs(d: DataFrame): DataFrame =
    d.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"),
        expr("array_join(transform(sequence(1, length(w)), " +
          "i -> concat(chr(1), substring(w, i, 1), chr(2))), ' ')").as("seq"),
        col("freq"))

  /** Frequency-weighted adjacent-pair census of a symbol table.
    * Vocab-sized; localCheckpoint cuts the crossJoin-per-round lineage
    * growth (house pattern for unrolled iteration) and lets the top-1
    * subplan and the census output share one materialization. */
  private def bpePairsOf(seq: DataFrame): DataFrame =
    seq.select(col("freq"), split(col("seq"), " ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms)-1), " +
          "i -> named_struct('l', element_at(syms, i), 'r', element_at(syms, i+1)))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pair_count"))
      .localCheckpoint()

  /** Merges the census's winning pair (count desc, lexicographic
    * tiebreak) into one symbol across the whole table -- ONE broadcast
    * row applied as a narrow per-row marked-string replace. */
  private def bpeMerge(seq: DataFrame, pairs: DataFrame): DataFrame = {
    val top1 = pairs.orderBy(col("pair_count").desc, bpeStripL, bpeStripR)
      .limit(1)
      .select(concat(col("l"), lit(" "), col("r")).as("search"),
        concat(lit("\u0001"), bpeStripL, bpeStripR, lit("\u0002")).as("repl"))
    seq.crossJoin(broadcast(top1))
      .select(col("w"), expr("replace(seq, search, repl)").as("seq"),
        col("freq"))
  }

  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    // r21 (VERDICT r20 task 4, guide §5): LAZY persist on the symbol
    // table between rounds — the BFS/PageRank per-round pattern. Each
    // round's EAGER pair-census checkpoint scans the round-start seq;
    // without the persist that scan re-ran bpeWordSeqs + every earlier
    // merge from the corpus (round r paid r fold steps — the census
    // aggregate executed once per round instead of once per query).
    // Round 1's checkpoint job populates the seq0 cache in passing;
    // each merge reads the previous round's cache and persists its own.
    var seq = bpeWordSeqs(Tables.documents(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outs = (1 to BpeRounds).map { r =>
      val pairs = bpePairsOf(seq)
      val out = pairs
        .orderBy(col("pair_count").desc, bpeStripL, bpeStripR).limit(BpeTopK)
        .select(lit(r).as("merge_round"), bpeStripL.as("left_sym"),
          bpeStripR.as("right_sym"), col("pair_count"))
      if (r < BpeRounds) seq = bpeMerge(seq, pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out
    }
    outs.reduce(_ union _)
      .sortSmall(col("merge_round"), col("pair_count").desc,
        col("left_sym"), col("right_sym"))
  }

  /** Tokenizer APPLY: segment the corpus with the learned merges and
    * census the result per language -- the fertility / compression check
    * run after every tokenizer training round. All `BpeRounds` winners
    * are applied (bpePairs shows the censuses; this query uses the final
    * vocabulary), then each document's whitespace tokens join their
    * subword segmentation through the VOCAB-sized (w, n_subwords) table
    * -- the corpus is scanned once for the (lang, word) census and never
    * re-tokenized per merge, which is the shape that holds when the
    * corpus is 100 TB and the vocab is millions of rows. Outputs per
    * lang: whitespace tokens, subword tokens, characters, fertility
    * (subwords per word) and mean subword length as integer fixed-point
    * -- everything exact. */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // same per-round lazy persist as bpePairs (r21) — the word census
    // and each merge execute once, not once per remaining round
    var seq = bpeWordSeqs(d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (1 to BpeRounds).foreach { _ =>
      seq = bpeMerge(seq, bpePairsOf(seq))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val seg = seq.select(col("w"),
      size(split(col("seq"), " ")).cast("long").as("n_sub"))
    val lw = d.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    lw.join(broadcast(seg), Seq("w"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sub")).as("n_subwords"),
        sum(col("c") * length(col("w")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_subwords"), col("n_chars"),
        expr("n_subwords * 1000000 div n_words").as("fertility_fp"),
        expr("n_chars * 1000000 div n_subwords").as("sub_len_fp"))
      .sortSmall(col("lang"))
  }

  /** Oracle twin: identical unrolled rounds; SUM over BIGINT is cast back
    * from DuckDB's HUGEINT, and the merge is the same marked replace. */
  private def bpeSqlStrip(c: String) =
    s"replace(replace($c, chr(1), ''), chr(2), '')"

  /** Shared oracle CTE chain: words/vocab/seq0 plus `rounds` unrolled
    * pair-census (+merge) rounds. `mergeLast` controls whether the final
    * round's winner is merged in (the APPLY twin needs seq<rounds>; the
    * census twin stops at p<rounds>). seqN carries w so the apply twin
    * can join segmentations back to the corpus. */
  private def bpeCtesSql(rounds: Int, mergeLast: Boolean): String = {
    def strip(c: String) = bpeSqlStrip(c)
    def pairsCte(n: Int): String =
      s"""p$n AS (
         |  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS pair_count FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
         |    FROM (SELECT string_split(seq, ' ') AS syms, freq FROM seq${n - 1}) t
         |    WHERE len(syms) >= 2) u
         |  GROUP BY p.l, p.r)""".stripMargin
    def mergeCte(n: Int): String =
      s"""top$n AS (
         |  SELECT l, r, chr(1) || ${strip("l || r")} || chr(2) AS merged
         |  FROM p$n ORDER BY pair_count DESC, ${strip("l")}, ${strip("r")} LIMIT 1),
         |seq$n AS (
         |  SELECT w, replace(seq, t.l || ' ' || t.r, t.merged) AS seq, freq
         |  FROM seq${n - 1}, top$n t)""".stripMargin
    val ctes = (1 to rounds).map { n =>
      if (n < rounds || mergeLast) pairsCte(n) + ",\n" + mergeCte(n)
      else pairsCte(n)
    }.mkString(",\n")
    s"""words AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |vocab AS (SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w),
      |seq0 AS (
      |  SELECT w, array_to_string(list_transform(range(1, length(w)+1),
      |    i -> chr(1) || w[i] || chr(2)), ' ') AS seq, freq
      |  FROM vocab),
      |$ctes""".stripMargin
  }

  val bpePairsSql: String = {
    def strip(c: String) = bpeSqlStrip(c)
    def outSel(n: Int): String =
      s"""(SELECT $n AS merge_round, ${strip("l")} AS left_sym,
         |  ${strip("r")} AS right_sym, pair_count
         | FROM p$n ORDER BY pair_count DESC, left_sym, right_sym LIMIT $BpeTopK)""".stripMargin
    s"""WITH ${bpeCtesSql(BpeRounds, mergeLast = false)}
      |${(1 to BpeRounds).map(outSel).mkString("\nUNION ALL\n")}
      |ORDER BY merge_round, pair_count DESC, left_sym, right_sym""".stripMargin
  }

  /** Oracle twin of [[bpeApply]]: same unrolled merges through
    * seq<rounds>, then the per-language fertility census; every HUGEINT
    * sum is cast back to BIGINT. */
  val bpeApplySql: String =
    s"""WITH ${bpeCtesSql(BpeRounds, mergeLast = true)},
      |seg AS (
      |  SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sub
      |  FROM seq$BpeRounds),
      |lw AS (
      |  SELECT lang, w, COUNT(*) AS c FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> '' GROUP BY lang, w)
      |SELECT lang,
      |  CAST(SUM(c) AS BIGINT) AS n_words,
      |  CAST(SUM(c * n_sub) AS BIGINT) AS n_subwords,
      |  CAST(SUM(c * length(w)) AS BIGINT) AS n_chars,
      |  CAST(SUM(c * n_sub) * 1000000 // SUM(c) AS BIGINT) AS fertility_fp,
      |  CAST(SUM(c * length(w)) * 1000000 // SUM(c * n_sub) AS BIGINT) AS sub_len_fp
      |FROM lw JOIN seg USING (w)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // Collocation min support: a pair must occur this often before its
  // lift is meaningful (Manning/Schütze's sparse-count caveat).
  private val MinPairCount = 5

  /** Collocation extraction (Church/Hanks 1990 association-ratio /
    * pointwise-mutual-information ranking, Manning & Schütze ch. 5): the
    * top-20 adjacent word pairs whose joint frequency most exceeds
    * independence. Ranked by the LIFT ratio p(xy)/(p(x)p(y)) in integer
    * fixed point rather than its log (PMI = log lift; log is
    * transcendental and can never cross-engine hash-match — the
    * agg_gini_impurity rationale — and ranking by lift IS ranking by
    * PMI, monotonically). All-double assembly with every operand cast
    * before any multiply, floor to 10⁶ fixed point.
    *
    * Scale posture: one token explode feeds both the bigram and unigram
    * censuses (shared-scan pattern of bigramLmScore); unigram counts
    * join back by vocab-sized broadcast ×2; totals ride one 1-row
    * broadcast cross join; top-k via final sort-limit. */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] as w1, t[i+1] as w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= MinPairCount)
    val tot = uni.agg(sum(col("c")).cast("long").as("n_uni"))
      .crossJoin(bi.agg(sum(col("c_xy")).cast("long").as("n_bi")))
    bi.join(broadcast(uni.select(col("w").as("w1"), col("c").as("c_x"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c_y"))), "w2")
      .crossJoin(broadcast(tot))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("c_xy"), col("c_x"), col("c_y"),
        expr("""cast(floor(1e6 * cast(c_xy as double) * cast(n_uni as double)
          |  * cast(n_uni as double)
          |  / (cast(n_bi as double) * cast(c_x as double) * cast(c_y as double)))
          |  as bigint)""".stripMargin).as("lift_fp"))
      .orderBy(col("lift_fp").desc, col("bigram"))
      .limit(20)
  }

  /** Oracle twin: identical censuses and identically-ordered all-double
    * lift assembly. */
  val collocationsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |uni AS (
      |  SELECT unnest(t) AS w FROM toks),
      |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      |bi AS (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]}), recursive := true)
      |  FROM toks WHERE len(t) >= 2),
      |bc AS (
      |  SELECT w1, w2, COUNT(*) AS c_xy FROM bi GROUP BY w1, w2
      |  HAVING COUNT(*) >= $MinPairCount),
      |tot AS (
      |  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uc) AS n_uni,
      |    (SELECT CAST(SUM(c_xy) AS BIGINT) FROM bc) AS n_bi)
      |SELECT b.w1 || ' ' || b.w2 AS bigram, b.c_xy, x.c AS c_x, y.c AS c_y,
      |  CAST(FLOOR(1e6 * CAST(b.c_xy AS DOUBLE) * CAST(t.n_uni AS DOUBLE)
      |    * CAST(t.n_uni AS DOUBLE)
      |    / (CAST(t.n_bi AS DOUBLE) * CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE)))
      |    AS BIGINT) AS lift_fp
      |FROM bc b JOIN uc x ON x.w = b.w1 JOIN uc y ON y.w = b.w2, tot t
      |ORDER BY lift_fp DESC, bigram LIMIT 20""".stripMargin
}
