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

/** The IVF quantizer hot loop as ONE codegen'd expression: the `p`
  * nearest centroids (by score ‖c‖² − 2·v·c, tie-broken on ascending
  * cid) of a float vector, returned as an array of cids in rank order.
  *
  * `cents` is a SINGLE literal of array<struct<cid int, csq double,
  * centroid array<double>>> — the whole quantizer state travels as one
  * serialized object, so plan size and codegen are independent of
  * nlist. That is what lets nlist scale as √N (Similarity.ivfCellsFor):
  * the earlier inline form spent k expression nodes × dim literal
  * doubles per projection, and the broadcast-crossjoin form
  * materialized N×k joined rows carrying the embedding payload
  * (measured 27 GB/pass at 500k×448 — 58 s for the sf10 query this
  * loop brings to ~8 s). Per row this is k·dim fused multiply-adds and
  * one bounded insertion sort of size p — no row explosion, no boxing,
  * no exchange.
  *
  * The score arithmetic is the exact sequence the crossjoin form ran:
  * csq (driver-folded) minus 2 × the left-to-right float×double dot —
  * bit-identical to FloatDoubleDot, hence to the DuckDB oracle's
  * `c.csq - 2 * list_sum(...)` — and the (score, cid) strict-less
  * insertion keeps the first (lowest-cid) entry on exact ties, matching
  * `ROW_NUMBER() OVER (ORDER BY score, cid)`. */
case class NearestCells(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCells =
    copy(first = f, second = s, third = t)

  // Decoded quantizer cache: the cents child is a plan literal, so its
  // evaluated ArrayData is the SAME object every row — decode it to
  // primitive arrays once (per task / per expression instance) instead of
  // paying a getStruct + getArray wrapper allocation per (row × centroid):
  // at 500k rows × 708 cells × 3 passes that is ~10⁹ allocations, and
  // removing them took the sf10 query 37 s → single digits. Reference
  // inequality re-decodes, so a non-literal child stays correct.
  @transient private var cacheSrc: AnyRef = _
  @transient private var cacheIds: Array[Int] = _
  @transient private var cacheCsq: Array[Double] = _
  @transient private var cacheMat: Array[Array[Double]] = _

  private def decoded(cents: ArrayData): Unit = {
    if (!(cents.asInstanceOf[AnyRef] eq cacheSrc)) {
      val k = cents.numElements()
      val ids = new Array[Int](k)
      val csq = new Array[Double](k)
      val mat = new Array[Array[Double]](k)
      var j = 0
      while (j < k) {
        val row = cents.getStruct(j, 3)
        ids(j) = row.getInt(0)
        csq(j) = row.getDouble(1)
        mat(j) = row.getArray(2).toDoubleArray()
        j += 1
      }
      cacheIds = ids; cacheCsq = csq; cacheMat = mat
      cacheSrc = cents.asInstanceOf[AnyRef]
    }
  }

  override def nullSafeEval(e: Any, c: Any, pAny: Any): Any = {
    val cents = c.asInstanceOf[ArrayData]
    decoded(cents)
    NearestCells.rank(e.asInstanceOf[ArrayData], cacheIds, cacheCsq, cacheMat,
      pAny.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c, pv) => {
      // decoded-quantizer mutable state: same reference-equality cache as
      // nullSafeEval, hoisted out of the per-row code path
      val src = ctx.addMutableState("org.apache.spark.sql.catalyst.util.ArrayData",
        "nearestCellsSrc")
      val ids = ctx.addMutableState("int[]", "nearestCellsIds")
      val csqs = ctx.addMutableState("double[]", "nearestCellsCsq")
      val mat = ctx.addMutableState("double[][]", "nearestCellsMat")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val topS = ctx.freshName("topS")
      val topC = ctx.freshName("topC")
      val filled = ctx.freshName("filled")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val cid = ctx.freshName("cid")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val dj = ctx.freshName("dj")
      s"""
         |if ($src != $c) {
         |  final int $k = $c.numElements();
         |  $ids = new int[$k];
         |  $csqs = new double[$k];
         |  $mat = new double[$k][];
         |  for (int $dj = 0; $dj < $k; $dj++) {
         |    final org.apache.spark.sql.catalyst.InternalRow $row = $c.getStruct($dj, 3);
         |    $ids[$dj] = $row.getInt(0);
         |    $csqs[$dj] = $row.getDouble(1);
         |    $mat[$dj] = $row.getArray(2).toDoubleArray();
         |  }
         |  $src = $c;
         |}
         |final int $p = $pv;
         |final double[] $topS = new double[$p];
         |final int[] $topC = new int[$p];
         |int $filled = 0;
         |for (int $j = 0; $j < $ids.length; $j++) {
         |  final int $cid = $ids[$j];
         |  final double[] $cent = $mat[$j];
         |  final int $n = java.lang.Math.min($e.numElements(), $cent.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $e.getFloat($i) * $cent[$i];
         |  }
         |  final double $s = $csqs[$j] - 2.0 * $dot;
         |  int $pos = ($filled < $p) ? $filled : $p;
         |  while ($pos > 0 && ($s < $topS[$pos - 1] ||
         |      ($s == $topS[$pos - 1] && $cid < $topC[$pos - 1]))) $pos--;
         |  if ($pos < $p) {
         |    for (int $m = java.lang.Math.min($filled, $p - 1); $m > $pos; $m--) {
         |      $topS[$m] = $topS[$m - 1]; $topC[$m] = $topC[$m - 1];
         |    }
         |    $topS[$pos] = $s;
         |    $topC[$pos] = $cid;
         |    if ($filled < $p) $filled++;
         |  }
         |}
         |final int[] $out = new int[$filled];
         |System.arraycopy($topC, 0, $out, 0, $filled);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
}

/** The decoded IVF quantizer payload — primitive arrays, shipped to
  * executors ONCE via torrent broadcast instead of riding inside every
  * serialized plan/task binary as a `typedLit` literal. With
  * nlist = ⌈√N⌉ (Similarity.ivfCellsFor) the quantizer is k×dim doubles
  * and grows with the corpus: at 10¹¹ vectors × 64 dims it is ~160 MB,
  * which a plan literal would re-serialize per plan, bloat the codegen
  * constant pool with, and re-broadcast with every task binary. A
  * `Broadcast` handle keeps the PLAN O(1) in nlist — the executors
  * fetch the payload once per node, exactly MLlib's KMeansModel shape. */
final class Quantizer(val ids: Array[Int], val csq: Array[Double],
    val mat: Array[Array[Double]]) extends Serializable {
  def k: Int = ids.length
}

object NearestCells {
  /** The quantizer probe loop shared by the literal-backed and
    * broadcast-backed expressions: the `p` nearest centroids of `emb` by
    * score ‖c‖² − 2·v·c, tie-broken on ascending cid — bit-identical
    * arithmetic and tie order to NearestCells.nullSafeEval/doGenCode
    * (same left-to-right float×double fmas, same strict-less bounded
    * insertion). Static so generated code can call it without an extra
    * reference object. */
  def rank(emb: ArrayData, ids: Array[Int], csqs: Array[Double],
      mat: Array[Array[Double]], p: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = ids.length
    val topS = new Array[Double](p)
    val topC = new Array[Int](p)
    var filled = 0
    var j = 0
    while (j < k) {
      val cid = ids(j)
      val cent = mat(j)
      val n = math.min(emb.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += emb.getFloat(i).toDouble * cent(i)
        i += 1
      }
      val s = csqs(j) - 2.0 * dot
      var pos = if (filled < p) filled else p
      while (pos > 0 && (s < topS(pos - 1) ||
        (s == topS(pos - 1) && cid < topC(pos - 1)))) pos -= 1
      if (pos < p) {
        var m = math.min(filled, p - 1)
        while (m > pos) { topS(m) = topS(m - 1); topC(m) = topC(m - 1); m -= 1 }
        topS(pos) = s
        topC(pos) = cid
        if (filled < p) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(topC.take(filled))
  }
}

/** Broadcast-backed nearest-cell assignment: same semantics and
  * bit-identical arithmetic as [[NearestCells]], but the quantizer
  * arrives as a `Broadcast[Quantizer]` CONSTRUCTOR parameter — the plan
  * carries an 8-byte handle, not the k×dim payload. This closes the
  * √N-driver-state channel the corpus-scaled nlist opened: task-binary
  * size, plan serialization, and codegen constant-pool pressure are all
  * O(1) in nlist (pinned by QuantizerBroadcastSpec). Not registrable by
  * name (the broadcast can't ride through `call_function` args);
  * constructed directly and wrapped via the DatasetShim column bridge. */
case class NearestCellsBcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Quantizer], p: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells_bcast"

  override protected def withNewChildInternal(newChild: Expression): NearestCellsBcast =
    copy(child = newChild)

  @transient private lazy val q: Quantizer = bc.value

  override def nullSafeEval(e: Any): Any =
    NearestCells.rank(e.asInstanceOf[ArrayData], q.ids, q.csq, q.mat, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      // the broadcast HANDLE goes into the references array; the payload
      // is fetched lazily once per task and cached in mutable state
      val bcRef = ctx.addReferenceObj("nearestCellsBcastHandle", bc,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      val qv = ctx.addMutableState("graft.functions.Quantizer", "nearestCellsQuantizer")
      s"""
         |if ($qv == null) {
         |  $qv = (graft.functions.Quantizer) $bcRef.value();
         |}
         |${ev.value} = graft.functions.NearestCells.rank(
         |  $e, $qv.ids(), $qv.csq(), $qv.mat(), $p);
       """.stripMargin
    })
}
