package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Blocked-free classic Bloom filter (Bloom, "Space/time trade-offs in
  * hash coding with allowable errors", CACM 1970) over long keys, shared
  * by the build aggregate (`BloomBuildLongs`) and the probe expression
  * (`BloomMightContain`). K positions per key come from double hashing
  * (h1 + i·h2; Kirsch/Mitzenmacher, "Less hashing, same performance",
  * ESA 2006) over a splitmix64 mix — one multiply chain per key, no
  * per-i rehash.
  *
  * This is the RUNTIME FILTER primitive (the semi-join pushdown every
  * warehouse engine injects for selective dim→fact joins): build once over
  * the filtered dim keys (bytes, broadcastable), probe per fact row inside
  * the scan's codegen — fact rows that cannot match never reach the join's
  * exchange. False positives are possible by construction, so a bloom
  * prune must always sit IN FRONT of the exact join, never replace it;
  * the join output is therefore exactly the unfiltered plan's output.
  */
object BloomOps {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val NumHashes = 4

  def set(words: Array[Long], numBits: Int, v: Long): Unit = {
    val h1 = mix(v)
    val h2 = mix(h1) | 1L // odd, so the probe sequence covers the table
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Probe — static so generated code can call it directly. `bytes` is the
    * little-endian word dump from `BloomBuildLongs.eval`. */
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val numBits = bytes.length * 8
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      val byteIdx = pos >>> 3
      if (((bytes(byteIdx) >> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Aggregate: bloom-filter bytes over the child's long values. `numBits`
  * must be a multiple of 64. The buffer is a fixed numBits/64-word array —
  * size is a compile-time constant of the plan (16 KiB at the default 2¹⁷
  * bits), so a billion-key build costs the same memory as an empty one;
  * merges OR word-wise (associative ⇒ map-side combine applies). */
case class BloomBuildLongs(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildLongs =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildLongs =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.set(buf, numBits, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}

/** `graft_bloom_contains(bloomBytes, key)` — codegen probe; the hot path
  * is a static call (no virtual dispatch, no boxing) so it inlines into
  * the scan's whole-stage-generated loop. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomOps.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomOps.mightContain($b, $k)")
}
