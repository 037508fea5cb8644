package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the training-data pipeline ops on synthetic and
  * real frames (value-level correctness is the DuckDB gate; these pin the
  * semantics the gate can't see — degenerate inputs, conservation laws). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("hashSplit partitions the corpus exactly (no doc lost or counted twice)") {
    val d = graft.Tables.documents(spark, dir)
    val total = d.count()
    val split = Pipeline.hashSplitDf(d)
    assert(split.agg(sum("n_docs")).head().getLong(0) === total)
    val names = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")))
  }

  test("hashSplit routes negative doc_ids by floor-mod, matching the SQL twin") {
    // The oracle twin computes ((x % 10) + 10) % 10 — identical to Spark's
    // pmod for negative ids; this pins agreement beyond the generated
    // (non-negative) corpus.
    val d = docs(
      (-7L, "neg seven", "en", "a"),
      (-1L, "neg one", "en", "a"),
      (0L, "zero", "en", "a"),
      (13L, "thirteen", "en", "a"))
    val byId = d.withColumn("bucket",
        pmod(col("doc_id") * lit(115249L) + lit(33391L), lit(10L)))
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, bucket) =>
      assert(bucket === Math.floorMod(id * 115249L + 33391L, 10L),
        s"doc_id=$id")
    }
    assert(Pipeline.hashSplitDf(d).agg(sum("n_docs")).head().getLong(0) === 4L)
  }

  test("hashSplit is deterministic across runs") {
    val d = graft.Tables.documents(spark, dir)
    val a = Pipeline.hashSplitDf(d).collect().toSeq
    val b = Pipeline.hashSplitDf(d).collect().toSeq
    assert(a === b)
  }

  test("packSequences conserves tokens and numbers chunks from zero") {
    val d = graft.Tables.documents(spark, dir)
    val packed = Pipeline.packSequencesDf(d)
    val totalTokens = d
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(packed.agg(sum("n_tokens")).head().getLong(0) === totalTokens)
    // per lang: chunk ids are contiguous 0..max (the exclusive prefix sum
    // can't skip a window)
    val bad = packed.groupBy("lang")
      .agg(min("chunk").as("mn"), max("chunk").as("mx"),
        countDistinct("chunk").as("n"))
      .filter(col("mn") =!= 0 || col("n") =!= col("mx") + 1)
      .count()
    assert(bad === 0)
  }

  test("packSequences: doc order within a stratum is contiguous across chunks") {
    val d = graft.Tables.documents(spark, dir)
    val packed = Pipeline.packSequencesDf(d).orderBy("lang", "chunk").collect()
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) < b.getLong(4),
            "last_doc of chunk k must precede first_doc of chunk k+1")
        case _ => ()
      }
    }
  }

  test("qualityFunnel stages are monotone non-increasing from the total") {
    val d = graft.Tables.documents(spark, dir)
    val stages = Pipeline.qualityFunnelDf(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("s0_total") === d.count())
    assert(stages("s0_total") >= stages("s1_chars"))
    assert(stages("s1_chars") >= stages("s2_tokens"))
    assert(stages("s2_tokens") >= stages("s3_avg_word_len"))
  }

  test("mixtureSample keeps every en doc, samples others, and is deterministic") {
    val d = graft.Tables.documents(spark, dir)
    val rows = Pipeline.mixtureSampleDf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val byLang = rows.map { case (l, n, k) => l -> ((n, k)) }.toMap
    byLang.get("en").foreach { case (n, k) => assert(k === n, "en rate is 1000/1000") }
    rows.foreach { case (lang, n, kept) =>
      assert(kept >= 0 && kept <= n, s"$lang kept out of range") }
    assert(rows === Pipeline.mixtureSampleDf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("repetitionScore drops sub-bigram docs and bounds the ratio") {
    val d = docs(
      (1L, "one", "en", "s"),                        // 1 token — excluded
      (2L, "a b a b a b", "en", "s"),                // repeated bigrams
      (3L, "w x y z", "en", "s"))                    // all distinct
    val r = Pipeline.repetitionScoreDf(d).collect()
    assert(!r.exists(_.getLong(0) == 1L))
    val byId = r.map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(byId(2L) > 0.5 && byId(2L) <= 1.0)
    assert(byId(3L) === 0.0)
    r.foreach(x => assert(x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0))
  }

  test("normalizeStats collapses case/punct/whitespace variants") {
    val d = docs(
      (1L, "Hello,   World!", "en", "s"),
      (2L, "hello world", "en", "s"),
      (3L, "unrelated text", "en", "s"))
    val row = Pipeline.normalizeStatsDf(d).head()
    assert(row.getLong(1) === 3L)   // n_docs
    assert(row.getLong(2) === 2L)   // docs 1 and 2 normalize identically
  }

  test("contamination never flags a benchmark doc and requires a shared shingle") {
    val d = docs(
      (1L, "alpha beta gamma delta", "en", "src0"),          // benchmark side
      (2L, "alpha beta gamma epsilon", "en", "src1"),        // shares "alpha beta gamma"
      (3L, "totally different words here", "en", "src1"))    // clean
    val r = Pipeline.contaminationDf(d).collect()
    assert(r.map(_.getLong(0)).toSet === Set(2L),
      "only the overlapping non-benchmark doc is flagged")
    assert(r.head.getLong(1) === 1L, "exactly one shared 3-gram shingle")
  }
}
