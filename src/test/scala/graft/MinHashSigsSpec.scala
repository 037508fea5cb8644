package graft

import graft.functions.MinHashSigs
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The minhash signature aggregate in isolation: update/merge/serialize
  * laws that the distributed partial-aggregation path relies on. */
class MinHashSigsSpec extends AnyFunSuite {

  private val agg = MinHashSigs(BoundReference(0, LongType, nullable = true), 16)

  private def updated(values: Seq[Long]): Array[Long] =
    values.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v))
    }

  test("merge of split buffers equals single-pass update") {
    val all = Seq(3L, 99L, -7L, 42L, 42L, 1000L)
    val (l, r) = all.splitAt(3)
    val merged = agg.merge(updated(l), updated(r))
    assert(merged.toSeq === updated(all).toSeq)
  }

  test("serialize round-trips the buffer") {
    val buf = updated(Seq(5L, 17L, 23L))
    assert(agg.deserialize(agg.serialize(buf)).toSeq === buf.toSeq)
  }

  test("buffer is element-wise monotone: adding rows never raises a slot") {
    val a = updated(Seq(1L, 2L))
    val b = updated(Seq(1L, 2L, 3L))
    assert(a.zip(b).forall { case (x, y) => y <= x })
  }

  test("per-row signatures equal the aggregate path on random corpora") {
    // The production path (graft_minhash_sigs_row off the raw token
    // hashes) and the aggregate path (graft_minhash_sigs over the
    // exploded df-capped shingle table) must produce IDENTICAL signatures
    // whenever the df cap does not bind — same shingle fold, same family,
    // min duplicate-insensitive. This is the invariant that let the
    // pipeline drop the regroup shuffle.
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 200L).map { id =>
      val n = 1 + rnd.nextInt(30) // includes <3-token docs (no shingles)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val rowPath = graft.ops.Dedup.rowSigs(docs)
    val aggPath = graft.ops.Dedup
      .hashedShingles(docs, maxDf = Int.MaxValue)
      .groupBy(col("doc_id"))
      .agg(call_function("graft_minhash_sigs", col("sh"), lit(64)).as("sig"))
    val row = rowPath.as[(Long, Seq[Long])].collect().toMap
    val viaAgg = aggPath.as[(Long, Seq[Long])].collect().toMap
    // both paths drop <3-token docs (no shingles): identical key sets
    assert(row.keySet === viaAgg.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(row(id) === sig, s"doc $id signatures diverge")
    }
  }

  test("null inputs are ignored") {
    val withNull = agg.update(updated(Seq(7L)), InternalRow(null))
    assert(withNull.toSeq === updated(Seq(7L)).toSeq)
  }
}
