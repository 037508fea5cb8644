package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** SpaceSaving (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams") heavy-hitters sketch as a custom
  * `TypedImperativeAggregate` — the single-pass, fixed-memory, mergeable
  * alternative to an exact groupBy for top-k frequency queries.
  *
  * Why it matters at 100 TB: an exact top-k over a high-cardinality column
  * shuffles every distinct key; this sketch keeps `capacity` counters per
  * partition, partials merge associatively, and the shuffle carries one
  * serialized sketch per partition. Guarantee: any item with true count
  * > N/capacity is present, and reported counts overestimate by at most
  * the recorded `err`. When `capacity` ≥ distinct items the sketch is
  * EXACT — which is how the inventory query is oracle-verified against a
  * plain COUNT(*) in DuckDB.
  *
  * Buffer is a plain count map (O(capacity) eviction scan — fine for the
  * small capacities sketches use; a production stream-summary structure
  * with count buckets makes eviction O(1), same semantics).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Sketch] {

  import SpaceSavingTopK._

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false))))

  override def prettyName: String = "graft_topk_sketch"

  override def createAggregationBuffer(): Sketch = new Sketch(capacity)

  override def update(buf: Sketch, input: InternalRow): Sketch = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Sketch, other: Sketch): Sketch = buf.mergeWith(other)

  override def eval(buf: Sketch): Any = {
    val top = buf.counts.toSeq
      .sortBy { case (tok, (n, _)) => (-n, tok) }
      .take(k)
      .map { case (tok, (n, err)) =>
        InternalRow(UTF8String.fromString(tok), n, err)
      }
    new GenericArrayData(top)
  }

  override def serialize(buf: Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (tok, (n, err)) =>
      val b = tok.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(n); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cap = in.readInt()
    val sketch = new Sketch(cap)
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val n = in.readLong()
      val err = in.readLong()
      sketch.counts.put(new String(b, "UTF-8"), (n, err))
      i += 1
    }
    sketch
  }
}

object SpaceSavingTopK {

  /** token -> (count, overestimation error). */
  final class Sketch(val capacity: Int) {
    val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

    def offer(tok: String): Unit = counts.get(tok) match {
      case Some((n, err)) => counts.update(tok, (n + 1, err))
      case None if counts.size < capacity => counts.update(tok, (1L, 0L))
      case None =>
        // evict the minimum-count item; its count becomes the new item's
        // error bound (classic SpaceSaving replacement)
        val (minTok, (minN, _)) = counts.minBy { case (t, (n, _)) => (n, t) }
        counts.remove(minTok)
        counts.update(tok, (minN + 1, minN))
    }

    def mergeWith(other: Sketch): Sketch = {
      other.counts.foreach { case (tok, (n, err)) =>
        counts.get(tok) match {
          case Some((n0, err0)) => counts.update(tok, (n0 + n, err0 + err))
          case None => counts.update(tok, (n, err))
        }
      }
      if (counts.size > capacity) {
        // keep the top-capacity by count (deterministic token tiebreak)
        val keep = counts.toSeq.sortBy { case (t, (n, _)) => (-n, t) }.take(capacity)
        counts.clear()
        keep.foreach { case (t, v) => counts.put(t, v) }
      }
      this
    }
  }
}
