package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift guard: the query counts stated in SURVEY.md and README.md
  * must track `SparkEntry.queries.size`. Every past round bumped the
  * inventory; a stale count in the docs misstates the verified surface,
  * so the mismatch fails HERE instead of surviving to review. */
class DocsSyncSpec extends AnyFunSuite {
  private def firstMatch(path: String, re: scala.util.matching.Regex): Int = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    re.findFirstMatchIn(text)
      .getOrElse(fail(s"$path no longer contains the inventory-count line"))
      .group(1).toInt
  }

  test("SURVEY.md inventory line matches the registered query count") {
    val n = firstMatch("SURVEY.md", """(\d+) queries; \*\*\1 oracle-checked""".r)
    assert(n === SparkEntry.queries.size,
      s"SURVEY.md says $n queries, SparkEntry registers ${SparkEntry.queries.size}")
  }

  test("README.md inventory line matches the registered query count") {
    val n = firstMatch("README.md", """(\d+) entries — \*\*all \1""".r)
    assert(n === SparkEntry.queries.size,
      s"README.md says $n entries, SparkEntry registers ${SparkEntry.queries.size}")
  }

  test("every query has an oracle twin and vice versa (doc-level claim)") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
