package graft

import org.scalatest.funsuite.AnyFunSuite

/** The structural guard VERDICT r17 asked for: the fixed-cap-vs-
  * scaling-contract bug class re-entered five times, always with a NEW
  * operator whose literal capacity predated the audit. This spec makes
  * CAP_AUDIT.md the machine-checked source of truth — every capacity
  * token extracted from the source must be classified there, every
  * class-b policy must exist and be pinned in ScalePolicySpec, and a raw
  * numeric literal feeding a cap call site fails CI until classified. */
class CapAuditSpec extends AnyFunSuite {
  import java.nio.file.{Files, Path, Paths}
  import scala.jdk.CollectionConverters._

  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  private lazy val mainSources: Seq[(String, String)] = {
    val root = Paths.get("src/main/scala/graft")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => (root.relativize(p).toString, read(p)))
      .toSeq
  }
  private lazy val audit = read(Paths.get("CAP_AUDIT.md"))
  private lazy val auditTokens: Set[String] =
    """\|\s*`([A-Za-z0-9_.:/()]+)`\s*\|""".r
      .findAllMatchIn(audit).map(_.group(1)).toSet
  private lazy val auditPolicies: Set[String] =
    """- `([A-Za-z0-9_]+)` —""".r
      .findAllMatchIn(audit).map(_.group(1)).toSet

  test("every graft_bounded_collect capacity argument is a classified token") {
    val capRe = """(?s)"graft_bounded_collect"\s*,\s*[\s\S]{0,80}?lit\(([A-Za-z0-9_.]+)\)""".r
    for ((file, src) <- mainSources if !file.startsWith("functions")) {
      // functions/ holds the expression's own definition/registration —
      // every CALL site (ops, multimodal, plans, streaming, …) is audited
      val calls = "call_function\\(\"graft_bounded_collect\"".r
        .findAllMatchIn(src).size
      val caps = capRe.findAllMatchIn(src).map(_.group(1)).toList
      assert(caps.size === calls,
        s"$file: ${calls} bounded_collect call(s) but only ${caps.size} " +
          "extractable lit(<token>) capacities — keep the capacity a lit " +
          "of a named token so the audit can see it")
      caps.foreach { tok =>
        val key = tok.split('.').last // Dedup.MaxBucketSize → MaxBucketSize
        assert(tok.forall(!_.isDigit) || auditTokens.contains(s"$file:$tok"),
          s"$file: raw numeric bounded_collect capacity $tok is unclassified " +
            "— add '<file>:<literal>' to CAP_AUDIT.md or name it")
        if (tok.exists(!_.isDigit))
          assert(auditTokens.contains(key),
            s"$file: bounded_collect capacity token `$key` is not in CAP_AUDIT.md")
      }
    }
  }

  test("every cap-named integer constant is classified (and no stale rows)") {
    val constRe =
      """\bval\s+([A-Za-z0-9_]*(?:Max|Cap|Capacity|Guard|Floor|Top[Kk])[A-Za-z0-9_]*)\s*=\s*([0-9][0-9_]*)(?![.\deExX])""".r
    val found = (for ((file, src) <- mainSources;
                      m <- constRe.findAllMatchIn(src)) yield m.group(1)).toSet
    val missing = found.diff(auditTokens)
    assert(missing.isEmpty,
      s"unclassified cap-named constants: $missing — classify them in CAP_AUDIT.md")
    // stale-row guard: every UpperCamel constant row must still exist in source
    val tableConsts = auditTokens.filter(t => t.headOption.exists(_.isUpper) && !t.contains(":"))
    val stale = tableConsts.diff(found)
    assert(stale.isEmpty,
      s"CAP_AUDIT.md classifies constants that no longer exist: $stale")
  }

  test("no raw numeric literal feeds a cap-taking call site") {
    val fns = Seq("dropHotBuckets", "hashedShingles", "minhashCandidates",
      "candidatesFromSigs", "simhashPairs", "hammingPairs", "semanticWithCap")
    val siteRe =
      s"""(?s)(?:${fns.mkString("|")})\\((?:[^()]|\\([^()]*\\)){0,200}?(?:,|bucketCap\\s*=|clusterCap\\s*=|cap\\s*=)\\s*([0-9][0-9_]*)\\s*[,)]""".r
    for ((file, src) <- mainSources) {
      siteRe.findAllMatchIn(src).foreach { m =>
        assert(auditTokens.contains(s"$file:${m.group(1)}"),
          s"$file: raw literal capacity ${m.group(1)} at a cap call site — " +
            "replace with a named classified constant/policy or classify " +
            s"'$file:${m.group(1)}' in CAP_AUDIT.md")
      }
    }
  }

  /** r18 VERDICT task 6: the extractor for output-size literals —
    * `.limit(n)` and `topKPerGroup(..., k)` with a raw numeric k — each
    * must be classified in CAP_AUDIT.md as `<file>:limit(n)` /
    * `<file>:topk(n)`. Factored out so the canary test below can prove
    * an unclassified literal actually fails. */
  private def unclassifiedOutputLiterals(
      sources: Seq[(String, String)]): Seq[String] = {
    val limitRe = """\.limit\((\d+)\)""".r
    // k is the LAST argument; tolerate 3 paren-nesting levels in the
    // preceding args (Seq(("col", true)) nests two)
    val topkRe =
      """topKPerGroup\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*?,\s*(?:k\s*=\s*)?(\d+)\s*\)""".r
    sources.flatMap { case (file, src) =>
      val lims = limitRe.findAllMatchIn(src)
        .map(m => s"$file:limit(${m.group(1)})")
      val topks = topkRe.findAllMatchIn(src)
        .map(m => s"$file:topk(${m.group(1)})")
      (lims ++ topks).toSeq.distinct.filterNot(auditTokens.contains)
    }
  }

  test("every raw limit/top-k output literal is classified") {
    val missing = unclassifiedOutputLiterals(mainSources)
    assert(missing.isEmpty,
      s"unclassified output-size literals: $missing — add '<file>:limit(n)'" +
        " / '<file>:topk(n)' rows to CAP_AUDIT.md (class a if the twin" +
        " mirrors the LIMIT) or derive the literal from a named constant")
  }

  test("canary: an unclassified limit literal in a new operator fails") {
    val canary = Seq(("ops/Canary.scala",
      """def topUsers(df: DataFrame) = df.orderBy(col("n").desc).limit(37)
        |val t = graft.plans.GraftOps.topKPerGroup(df, Seq("g"),
        |  Seq(("n", true)), 41)""".stripMargin))
    val missing = unclassifiedOutputLiterals(canary)
    assert(missing.contains("ops/Canary.scala:limit(37)"),
      s"extractor missed the canary limit literal: $missing")
    assert(missing.contains("ops/Canary.scala:topk(41)"),
      s"extractor missed the canary topk literal: $missing")
  }

  test("every class-b policy function exists in source and is pinned in ScalePolicySpec") {
    val allSrc = mainSources.map(_._2).mkString("\n")
    val pinSrc = read(Paths.get("src/test/scala/graft/ScalePolicySpec.scala"))
    auditPolicies.foreach { fn =>
      assert(s"def $fn\\b".r.findFirstIn(allSrc).isDefined,
        s"CAP_AUDIT.md lists policy `$fn` but no `def $fn` exists in src/main")
      assert(pinSrc.contains(fn),
        s"policy `$fn` is not pinned by name in ScalePolicySpec.scala")
    }
    // and the expected policy census can only GROW — a policy silently
    // dropped from the table is exactly the regression this spec guards
    assert(auditPolicies.size >= 8, s"policy list shrank: $auditPolicies")
  }

  test("every classified row carries a known class tag") {
    val rowRe = """\|\s*`[A-Za-z0-9_.:/()]+`\s*\|\s*([a-z+]+)\s*\|""".r
    val classes = rowRe.findAllMatchIn(audit).map(_.group(1)).toSet
    val allowed = Set("a", "b", "a+b", "param", "strategy")
    assert(classes.nonEmpty && classes.subsetOf(allowed),
      s"unknown class tags in CAP_AUDIT.md: ${classes.diff(allowed)}")
  }
}
