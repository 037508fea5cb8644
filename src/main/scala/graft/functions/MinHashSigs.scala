package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All `numHashes` min-hash signature slots of a group in ONE aggregate
  * (Broder 1997; the i-th family member is xxhash64 of the input keyed by
  * seed i): buffer = `long[numHashes]`, update = a tight JVM loop of
  * hash-and-min, merge = element-wise min, eval = `array<long>`.
  *
  * Why not 64 separate `min(xxhash64(i, sh))` aggregate columns? That
  * formulation is semantically identical but generates a 64-buffer
  * whole-stage-codegen function whose Janino compilation costs ~0.5 s per
  * stage (measured — it dominated the minhash query), and 64 generic agg
  * buffers per group. One imperative aggregate keeps the generated code
  * tiny and the inner loop branch-free; partials merge associatively, so
  * map-side combine still applies and the shuffle carries one 512-byte
  * buffer per (partition, doc).
  */
case class MinHashSigs(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigs =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSigs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSigs =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(sh, i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }
}
