package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fuzzy join's load-bearing claim is candidate COMPLETENESS: the
  * ≤2-deletion-neighborhood equi-join may only over-generate, never miss
  * a pair at edit distance ≤ 2. The oracle twin re-proves it on the
  * corpus; this spec pins it against an in-memory brute force on an
  * adversarial little domain (repeats, prefixes, transposition-ish
  * shapes) so a key-construction regression fails here, not at the
  * driver. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def editDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("deletion-neighborhood candidates find every ed<=2 pair of an adversarial domain") {
    import spark.implicits._
    val domain = Seq(
      "abc", "abcd", "abcde", "acde", "axcde", "xbcde", "abxde",
      "aabb", "abab", "abba", "baba", "aab", "abb", "aa", "ab", "ba",
      "hash join", "hash jon", "hash joins", "hashjoin", "sash join",
      "mergesort", "merge sort", "mergesor", "mergeso", "xmergesort")
    val truth = (for {
      a <- domain; b <- domain if a < b
      d = editDist(a, b) if d <= 2
    } yield (a, b, d)).toSet

    // run the op's candidate+verify pipeline over this domain by
    // substituting the corpus-derived input with the test domain
    val bi = domain.toDF("s")
    val keyed = bi.select(col("s"), explode(expr(
      """concat(
        |  array(s),
        |  transform(sequence(0, length(s)-1),
        |    i -> concat(substring(s, 1, i), substring(s, i+2, length(s)))),
        |  flatten(transform(sequence(0, length(s)-2),
        |    i -> transform(sequence(i+1, length(s)-1),
        |      j -> concat(substring(s, 1, i),
        |                  substring(s, i+2, j-i-1),
        |                  substring(s, j+2, length(s)))))))""".stripMargin))
      .as("k")).distinct()
    val got = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.s") < col("b.s"))
      .select(col("a.s"), col("b.s")).distinct()
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .filter(col("dist") <= 2)
      .as[(String, String, Int)].collect().toSet

    assert(got === truth,
      s"missed=${truth -- got} extra=${got -- truth}")
  }

  test("corpus fuzzy join emits only verified pairs, ordered, within threshold") {
    import spark.implicits._
    val rows = AdvancedJoins.fuzzyEditDistJoin(spark, dir)
      .as[(String, String, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (s1, s2, d) =>
      s1 < s2 && d >= 1 && d <= 2 && editDist(s1, s2) == d
    })
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }
}
