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

  test("SURVEY.md cites the newest CORRECTNESS_r*.json present") {
    // r18 VERDICT task 5: the correctness claim went three rounds stale
    // (SURVEY still cited r15 while r16-r18 artifacts existed). The doc
    // must track the newest record in the repo root so a stale citation
    // fails CI instead of surviving to review.
    val rounds = new java.io.File(".").listFiles()
      .map(_.getName)
      .collect { case s if s.matches("CORRECTNESS_r\\d+\\.json") =>
        s.stripPrefix("CORRECTNESS_r").stripSuffix(".json").toInt }
    assert(rounds.nonEmpty, "no CORRECTNESS_r*.json artifacts in repo root")
    val newest = rounds.max
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val cited = """CORRECTNESS_r(\d+) passed all""".r
      .findFirstMatchIn(text)
      .getOrElse(fail("SURVEY.md no longer contains the correctness claim"))
      .group(1).toInt
    assert(cited === newest,
      s"SURVEY.md cites CORRECTNESS_r$cited but the newest artifact is r$newest")
  }
}
