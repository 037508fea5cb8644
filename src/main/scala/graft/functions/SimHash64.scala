package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash (Charikar 2002) of a token array as ONE per-row codegen
  * expression: each token is hashed, its bits vote ±1 into 64 counters,
  * and the sign vector packs into a long.
  *
  * The per-token hash is FNV-1a 64 over the token's UTF-8 bytes — chosen
  * deliberately over xxhash64: FNV-1a is a pure byte fold
  * (`h = (h ^ byte) * prime` mod 2⁶⁴), so ANY engine can reproduce the
  * signature exactly (the DuckDB oracle twin re-derives it with HUGEINT
  * arithmetic), making the whole simhash pipeline — signature, blocking,
  * Hamming filter — a portable, hash-checkable semantic instead of an
  * engine-internal sketch.
  *
  * This replaces the declarative formulation (explode tokens → 64
  * sum(±1) aggregate columns → repack), which shuffles every token and
  * aggregates 64 columns per document. As a per-row expression the
  * signature costs one pass over the token array inside the projection —
  * no explode, no shuffle, no aggregation; at 100 TB the signature
  * becomes a property of the scan, and only the (tiny) signature column
  * moves on to candidate pairing.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val counters = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counters = ctx.freshName("counters")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bytes = ctx.freshName("bytes")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $counters = new long[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    byte[] $bytes = $a.getUTF8String($i).getBytes();
         |    long $h = ${SimHash64.FnvOffsetBasis}L;
         |    for (int $j = 0; $j < $bytes.length; $j++) {
         |      $h = ($h ^ ($bytes[$j] & 0xffL)) * ${SimHash64.FnvPrime}L;
         |    }
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counters[$b]++; else $counters[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
}

object SimHash64 {
  /** FNV-1a 64 constants (public-domain spec: offset basis
    * 0xcbf29ce484222325, prime 0x100000001b3). */
  val FnvOffsetBasis: Long = 0xcbf29ce484222325L
  val FnvPrime: Long = 0x100000001b3L

  /** FNV-1a 64 over raw bytes; Java long multiplication wraps mod 2⁶⁴,
    * matching the HUGEINT-mod emulation in the DuckDB oracle twin. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffsetBasis
    var j = 0
    while (j < bytes.length) {
      h = (h ^ (bytes(j) & 0xffL)) * FnvPrime
      j += 1
    }
    h
  }
}
