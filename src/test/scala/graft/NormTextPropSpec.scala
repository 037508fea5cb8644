package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `graft_norm_text` (the r20 single-pass corpus normalizer) to the
  * exact declarative chain it replaced:
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
  * " +", " "))` — byte-for-byte, over generated adversarial strings
  * (space runs, control chars, digits, non-ASCII incl. 1:N lowercasing)
  * AND the real document corpus. */
class NormTextPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chain(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  test("graft_norm_text equals the regex chain on adversarial strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet =
      "aAzZ09 .,-_\t\n  !@#" + "ßİΣσς" + "日本éÉ Kſ"
    val gen = Seq.tabulate(4000) { i =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
      sb.toString
    } ++ Seq("", " ", "   ", "a", "A  B", " ab ", "a.b", "a . b", "ẞ", "İ",
      "K", "İİ x", "ab  ", "  ab", "1  2  3", "\t a \t b \t")
    val df = gen.toDF("text")
    val bad = df.select(col("text"),
        call_function("graft_norm_text", col("text")).as("fast"),
        chain(col("text")).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("graft_norm_text equals the regex chain on the real corpus") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, "/root/testdata/sf0.01")
    val n = d.select(col("text"),
        call_function("graft_norm_text", col("text")).as("fast"),
        chain(col("text")).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(n === 0)
  }
}
