package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication inventory (north-star extensions): exact, keep-first,
  * n-gram Jaccard, MinHash+LSH (Broder, "On the resemblance and
  * containment of documents", 1997; banding per Leskovec/Rajaraman/Ullman
  * ch. 3), SimHash (Charikar, "Similarity estimation techniques from
  * rounding algorithms", 2002 — the Google web-dedup signature of
  * Manku et al. 2007).
  *
  * Scale design:
  *  - Exact dedup = hash shuffle on the dedup key only (not the full row).
  *  - Jaccard/MinHash work on word 3-gram shingles built WITHOUT a window
  *    shuffle: `transform(sequence(...))` over the token array builds all
  *    shingles per-row inside codegen; only the (doc, shingle) explode
  *    shuffles, which is the irreducible cost of shingle joins.
  *  - MinHash+LSH is the 100 TB path: instead of the O(n²) shingle
  *    self-join, each doc reduces to 16 min-hashes, banded 4×4 so only
  *    same-bucket docs are paired. Banding turns near-dup detection into
  *    an equi-join — shuffle on (band, bucket-hash), linear in corpus size.
  *  - SimHash reduces each doc to one 64-bit signature; candidate pairing
  *    is bit_count(xor) — at scale you'd block on signature prefixes; here
  *    the corpus is small enough to pair exhaustively.
  */
object Dedup {

  /** Word-level 3-gram shingles per document, distinct, built without a
    * window shuffle (see class doc). Docs with <3 tokens are dropped —
    * also guards `sequence`'s descending-range behavior for negative sizes. */
  private[ops] def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(toks)-3), " +
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("shingle"))

  /** Exact dedup by full text: canonical (minimum) id + duplicate count
    * per distinct text. Shuffles only the grouping key. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
      .select(col("canonical_id"), col("n_dups"))
      .orderBy(col("canonical_id"))
  }

  val exactSql: String =
    """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin

  /** Deterministic "keep first" dedup: one representative row per
    * (lang, source), chosen by smallest doc_id — the deterministic version
    * of dropDuplicates (which keeps an arbitrary row and would never
    * hash-match another engine). */
  def keepFirst(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    d.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("source"))
  }

  val keepFirstSql: String =
    """SELECT lang, source, doc_id, n_chars FROM (
      |  SELECT lang, source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1 ORDER BY lang, source""".stripMargin

  /** Near-dup candidates by exact 3-gram Jaccard similarity: top 100 pairs.
    * The shingle self-join is O(candidate pairs) — correct as ground truth
    * / verification tier; `minhashLsh` below is the linear-scale tier. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // The join key is the 64-bit shingle hash, not the shingle string: the
    // output only carries per-pair counts, so the strings never need to
    // move — the self-join shuffle drops from ~20-byte keys to 8 bytes.
    // A hash collision would perturb a count (P ≈ n²/2⁶⁵ ≈ 2e-11 for the
    // 26k-shingle corpus); the DuckDB oracle string-joins and confirms
    // count equality on the actual corpus.
    val sh = shingles(Tables.documents(spark, dir))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(counts.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .select(col("d1"), col("d2"), col("n1"), col("n2"), col("common"),
        (col("common").cast(DoubleType) /
          (col("n1") + col("n2") - col("common")).cast(DoubleType)).as("jaccard"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(100)
  }

  val ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '),1) AS pos
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
      |counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, c1.n AS n1, c2.n AS n2, common,
      |  CAST(common AS DOUBLE) / CAST(c1.n + c2.n - common AS DOUBLE) AS jaccard
      |FROM pairs
      |JOIN counts c1 ON c1.doc_id = d1
      |JOIN counts c2 ON c2.doc_id = d2
      |ORDER BY jaccard DESC, d1, d2 LIMIT 100""".stripMargin

  private val NumHashes = 16
  private val Bands = 4 // 4 rows per band

  /** MinHash + LSH banding — the linear-scale near-dup path (rows-only
    * check: Spark's murmur3 `hash` is not reproducible in DuckDB).
    * 16 min-hashes per doc → 4 bands of 4 → docs sharing any band bucket
    * become candidates; candidates are scored by signature agreement
    * (estimator of Jaccard). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(Tables.documents(spark, dir))
    val sigCols = (0 until NumHashes).map(i =>
      min(hash(lit(i), col("shingle"))).as(s"sig_$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)

    val bandStructs = (0 until Bands).map { b =>
      val rows = (4 * b until 4 * b + 4).map(i => col(s"sig_$i"))
      struct(lit(b).as("band"), hash(rows: _*).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val cand = buckets.as("x")
      .join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()

    val agree = (0 until NumHashes).map(i =>
      (col(s"a.sig_$i") === col(s"b.sig_$i")).cast(LongType)).reduce(_ + _)
    cand
      .join(sigs.as("a"), col("d1") === col("a.doc_id"))
      .join(sigs.as("b"), col("d2") === col("b.doc_id"))
      .select(col("d1"), col("d2"),
        (agree.cast(DoubleType) / NumHashes).as("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("d1"), col("d2"))
  }

  /** SimHash near-dup: 64-bit frequency-weighted signature per doc via the
    * native per-row expression (graft.functions.SimHash64 — one pass over
    * the token array inside the scan projection; no explode, no 64-column
    * aggregation, no signature shuffle); pairs within Hamming distance 12.
    * Rows-only check (engine-specific hash). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = Tables.documents(spark, dir)
    val sig = d.select(col("doc_id"),
      expr("graft_simhash64(split(text, ' '))").as("simhash"))
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= 12)
      .orderBy(col("hamming"), col("d1"), col("d2"))
  }
}
