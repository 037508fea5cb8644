package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-round dynamics: each round's winning pair must disappear
  * from the next round's census (it was merged into one symbol). */
class BpePairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("winning pair is merged out and its fusion appears next round") {
    val rows = TextAnalysis.bpePairs(spark, dir).collect()
    assert(rows.length === 30, "3 rounds x top-10")
    val byRound = rows.groupBy(_.getInt(0))
    assert(byRound.keySet === Set(1, 2, 3))
    // winner of round r = max count, tie-broken lexicographically —
    // rows arrive ordered (merge_round, pair_count desc, l, r)
    for (r <- 1 to 2) {
      val winner = byRound(r).head
      val (wl, wr) = (winner.getString(1), winner.getString(2))
      val next = byRound(r + 1).map(x => (x.getString(1), x.getString(2)))
      assert(!next.contains((wl, wr)),
        s"round-${r + 1} census still contains round-$r winner ($wl,$wr)")
    }
    // counts are monotonically non-increasing within a round's top-10
    byRound.values.foreach { rs =>
      val cs = rs.map(_.getLong(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
  }

  test("apply census: merges only ever shorten segmentations, arithmetic consistent") {
    val rows = TextAnalysis.bpeApply(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, subs, chars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every word is >= 1 subword; every subword is >= 1 char; three
      // merges strictly shorten SOME segmentation corpus-wide
      assert(subs >= words, s"fewer subwords than words: $r")
      assert(chars >= subs, s"fewer chars than subwords: $r")
      assert(r.getLong(4) === subs * 1000000L / words, s"fertility_fp: $r")
      assert(r.getLong(5) === chars * 1000000L / subs, s"sub_len_fp: $r")
    }
    val (allSubs, allChars) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(allSubs < allChars,
      "three merges should compress at least one frequent word")
  }
}
