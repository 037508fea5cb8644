package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Collect up to `cap` long values per group; a (cap+1)-th value marks the
  * group overflowed and STOPS BUFFERING (the flag survives merges; the
  * buffer never grows). Evaluates to the collected array, or NULL for an
  * overflowed group — matching "drop buckets with more than cap members".
  *
  * This is the memory-safe primitive behind one-shuffle LSH bucket
  * pairing: `collect_list` over a degenerate bucket (adversarial hash
  * pileup, boilerplate cluster) materializes the entire bucket in one
  * aggregation buffer — at 100 TB that is an executor OOM. This aggregate
  * bounds every buffer (partial AND merged) at cap+1 longs by
  * construction, so a billion-row bucket costs the same memory as a
  * (cap+1)-row one and simply evaluates to NULL — exactly the hot-bucket
  * drop semantic the pairing tiers already define. Partials merge
  * associatively (concatenate-then-clamp), so map-side combine applies
  * and the shuffle never carries more than cap+1 longs per bucket per
  * mapper. */
case class BoundedCollectLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectLongs.Buf] {
  import BoundedCollectLongs.Buf

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLongs =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollectLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollectLongs =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bounded_collect"

  override def createAggregationBuffer(): Buf = new Buf(cap)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf.addAll(other); buf }

  override def eval(buf: Buf): Any =
    if (buf.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.n))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + 8 * buf.n)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf(cap)
    buf.overflowed = bb.get() == 1
    val n = bb.getInt()
    buf.values = new Array[Long](math.max(n, 1))
    buf.n = n
    var i = 0
    while (i < n) { buf.values(i) = bb.getLong(); i += 1 }
    buf
  }
}

object BoundedCollectLongs {
  /** Bounded buffer, at most cap live slots — GROWN geometrically, not
    * allocated eagerly: most groups are tiny (a singleton shingle, a
    * 2-doc bucket), and cap-sized upfront arrays would multiply the
    * partial-aggregation map's footprint by cap. */
  final class Buf(cap: Int) {
    var values = new Array[Long](math.min(8, math.max(cap, 1)))
    var n: Int = 0
    var overflowed: Boolean = false
    def add(v: Long): Unit =
      if (overflowed || n == cap) overflowed = true
      else {
        if (n == values.length)
          values = java.util.Arrays.copyOf(values, math.min(cap, values.length * 2))
        values(n) = v; n += 1
      }
    def addAll(o: Buf): Unit = {
      if (o.overflowed) overflowed = true
      var i = 0
      while (i < o.n && !overflowed) { add(o.values(i)); i += 1 }
    }
  }
}
