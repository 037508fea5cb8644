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

  test("null inputs are ignored") {
    val withNull = agg.update(updated(Seq(7L)), InternalRow(null))
    assert(withNull.toSeq === updated(Seq(7L)).toSeq)
  }
}
