package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: dot product of
  * two float vectors accumulated left-to-right in double precision.
  *
  * Semantically identical to the declarative form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, (s,x) -> s+x)`
  * — same element order, same widening, bit-identical result — but
  * compiled by whole-stage codegen into a primitive loop over the unsafe
  * array data: no per-element boxing, no intermediate array allocation,
  * no lambda dispatch. On the all-pairs similarity workload this is the
  * difference between an interpreted 65-allocation-per-pair inner loop and
  * a tight fused loop (measured ~20× on sf0.1; see BENCH notes).
  *
  * Assumes equal-length, null-free vectors (the embeddings table
  * guarantees both); trailing elements of a longer vector are ignored.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // No ExpectsInputTypes (AbstractDataType is private[sql]): inputs MUST be
  // array<float> columns — callers are the graft inventory only.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Dot product of a float vector with a DOUBLE vector (typically a
  * centroid literal), accumulated left-to-right in double precision —
  * bit-identical to the declarative
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*y), 0D, (s,x) -> s+x)`
  * it replaces in the IVF quantizer, but codegen'd: Catalyst
  * higher-order functions have no doGenCode, so the declarative form ran
  * INTERPRETED with per-element allocation in the hottest per-row loop
  * (k cells × dim multiplies × corpus × (rounds+2) projections). */
case class FloatDoubleDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot_fd"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Squared L2 norm of a float vector: semantically `graft_vec_dot(x, x)`
  * but evaluates its child ONCE and reads the array once per element.
  * Normally produced by the optimizer rule `VecDotSelfToSqNorm` rather
  * than written directly (see graft.functions.GraftExtensions). */
case class FloatVectorSqNorm(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_sqnorm"

  override protected def withNewChildInternal(newChild: Expression): FloatVectorSqNorm =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}
