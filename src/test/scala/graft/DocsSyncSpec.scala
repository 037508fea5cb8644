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

  /** Newest round number among the CORRECTNESS_r*.json files in `names`. */
  private def newestRound(names: Seq[String]): Option[Int] =
    names.collect { case s if s.matches("CORRECTNESS_r\\d+\\.json") =>
      s.stripPrefix("CORRECTNESS_r").stripSuffix(".json").toInt
    }.reduceOption(_ max _)

  /** COMMITTED correctness artifacts only (`git ls-files`). The driver
    * drops the next round's CORRECTNESS_r{N}.json into the repo root
    * AFTER the builder closes the round (r19: report at 00:00, artifact
    * at 00:07), so pinning SURVEY.md against files merely *present*
    * reddens every closed tree at the round boundary with no builder
    * action possible. The doc promise is scoped to the committed record. */
  private def committedArtifacts(): Seq[String] = {
    val p = new ProcessBuilder("git", "ls-files", "CORRECTNESS_r*.json").start()
    val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
    assert(p.waitFor() == 0, "git ls-files failed; cannot enumerate committed artifacts")
    out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  test("SURVEY.md cites the newest COMMITTED CORRECTNESS_r*.json") {
    // r18 VERDICT task 5: the correctness claim went three rounds stale
    // (SURVEY still cited r15 while r16-r18 artifacts existed). The doc
    // must track the newest committed record so a stale citation fails
    // CI instead of surviving to review — but only the COMMITTED record:
    // r19 VERDICT task 1 found the present-files variant tripping on the
    // driver's post-close artifact drop.
    val newest = newestRound(committedArtifacts())
      .getOrElse(fail("no committed CORRECTNESS_r*.json artifacts"))
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val cited = """CORRECTNESS_r(\d+) passed all""".r
      .findFirstMatchIn(text)
      .getOrElse(fail("SURVEY.md no longer contains the correctness claim"))
      .group(1).toInt
    assert(cited === newest,
      s"SURVEY.md cites CORRECTNESS_r$cited but the newest committed artifact is r$newest")
  }

  test("a newer UNTRACKED correctness artifact cannot redden the tree (canary)") {
    // The exact r19 failure replayed: drop an untracked CORRECTNESS file
    // newer than anything committed and assert the citation check's
    // basis ignores it. Cleanup in finally so the canary never leaks.
    val canary = java.nio.file.Paths.get("CORRECTNESS_r9999.json")
    java.nio.file.Files.write(canary, "{}".getBytes("UTF-8"))
    try {
      val committed = newestRound(committedArtifacts())
        .getOrElse(fail("no committed CORRECTNESS_r*.json artifacts"))
      assert(committed < 9999,
        s"committed-newest computation picked up the untracked canary (r$committed)")
      val present = newestRound(new java.io.File(".").listFiles().map(_.getName).toSeq)
      assert(present.contains(9999), "canary not visible on disk; test is vacuous")
    } finally java.nio.file.Files.deleteIfExists(canary)
  }
}
