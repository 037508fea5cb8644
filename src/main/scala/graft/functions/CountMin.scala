package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-min sketch (Cormode/Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) over long keys: a depth×width counter matrix; each key
  * increments one counter per row (double hashing, Kirsch/Mitzenmacher
  * ESA 2006, same h1 + i·h2 chain as [[BloomOps]]), and the estimate is
  * the MINIMUM over the key's counters. Estimates are one-sided
  * (est ≥ true count always) with overestimate ≤ (e/width)·N at
  * probability 1 − (1/2)^depth — the bounded-memory frequency table for
  * streams and corpora whose vocabulary cannot be held exactly.
  *
  * Counters merge by element-wise ADDITION (associative/commutative ⇒
  * map-side combine applies), unlike Bloom's OR — this is the sketch for
  * COUNTS where Bloom answers MEMBERSHIP and SpaceSaving keeps explicit
  * top-k candidates ([[SpaceSavingTopK]]); the three cover the classic
  * stream-summary triangle.
  *
  * Serialized layout (little-endian longs): [depth, width, counters…] —
  * self-describing, so the probe needs no parameters beyond the bytes.
  */
object CountMinOps {

  def update(buf: Array[Long], depth: Int, width: Int, v: Long): Unit = {
    val h1 = BloomOps.mix(v)
    val h2 = BloomOps.mix(h1) | 1L
    var d = 0
    while (d < depth) {
      val pos = java.lang.Long.remainderUnsigned(h1 + d * h2, width).toInt
      buf(d * width + pos) += 1L
      d += 1
    }
  }

  /** Point estimate — static so generated code calls it directly. `bytes`
    * is the self-describing dump from [[CountMinBuildLongs.eval]]. */
  def estimate(bytes: Array[Byte], v: Long): Long = {
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val depth = lb.get(0).toInt
    val width = lb.get(1).toInt
    val h1 = BloomOps.mix(v)
    val h2 = BloomOps.mix(h1) | 1L
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val pos = java.lang.Long.remainderUnsigned(h1 + d * h2, width).toInt
      val c = lb.get(2 + d * width + pos)
      if (c < min) min = c
      d += 1
    }
    min
  }
}

/** Aggregate: count-min counter matrix over the child's long values.
  * Buffer size is a compile-time constant of the plan (depth·width·8
  * bytes — 128 KiB at the 4×4096 defaults) regardless of input
  * cardinality. */
case class CountMinBuildLongs(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, "depth must be in [1, 16]")
  require(width > 0, "width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinBuildLongs =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): CountMinBuildLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinBuildLongs =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_build"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMinOps.update(buf, depth, width, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((buf.length + 2) * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val lb = bb.asLongBuffer()
    lb.put(depth.toLong).put(width.toLong).put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer()
    val out = new Array[Long](lb.capacity() - 2)
    lb.position(2)
    lb.get(out)
    out
  }
}

/** `graft_cms_estimate(cmsBytes, key)` — codegen point query; static call
  * so it inlines into the whole-stage-generated loop. */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(cms: Any, key: Any): Any =
    CountMinOps.estimate(cms.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.CountMinOps.estimate($b, $k)")
}
