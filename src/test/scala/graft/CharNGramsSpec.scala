package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom Generator must emit exactly the sliding character windows,
  * lazily, and behave like explode on edge cases (short/null input). */
class CharNGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("emits sliding n-grams; short and null inputs emit nothing") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("abcd"), Some("xy"), Some(""), None).toDF("s")
    val got = df.select(expr("graft_char_ngrams(s, 3)").as("gram"))
      .as[String].collect().sorted.toSeq
    assert(got === Seq("abc", "bcd"))
    val two = df.select(expr("graft_char_ngrams(s, 2)").as("gram"))
      .as[String].collect().sorted.toSeq
    assert(two === Seq("ab", "bc", "cd", "xy"))
  }

  test("generator output agrees with the declarative transform+explode") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val gen = docs.select(expr("graft_char_ngrams(text, 3)").as("gram"))
    val decl = docs.select(explode(expr(
      "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
      .as("gram"))
      .filter(length(col("gram")) === 3)
    assert(gen.exceptAll(decl).count() === 0L)
    assert(decl.exceptAll(gen).count() === 0L)
  }
}
