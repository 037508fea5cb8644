package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Rolling polynomial fingerprint (Karp–Rabin 1987 shape) of a string as
  * ONE per-row codegen expression: `acc = (acc·31 + byte) mod 1e9+7`,
  * seeded at 7, folded left-to-right over the UTF-8 bytes.
  *
  * Replaces the declarative `aggregate(transform(sequence(1, length(s)),
  * i -> ascii(substr(s, i, 1))), …)` formulation, which materializes a
  * length-sized index array, a second codepoint array, and evaluates a
  * per-element lambda through the interpreter-boxed HigherOrderFunction
  * path — three allocations per ROW. As a native expression the fold is
  * a tight byte loop inside whole-stage codegen: no arrays, no lambda
  * dispatch (measured ~5× on the fingerprint query at sf0.1).
  *
  * Byte-vs-codepoint semantics: for ASCII corpora (this testdata, and
  * the oracle identity the driver checks) bytes == codepoints, so the
  * DuckDB twin's per-character re-derivation matches exactly. Multibyte
  * UTF-8 folds per byte — still deterministic and order-sensitive, the
  * properties a fingerprint needs — but an engine deriving per CODEPOINT
  * would differ there; documented rather than hidden behind a slower
  * per-char decode. */
case class PolyHash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  // Declared so a non-string argument is an ANALYSIS-time error, not a
  // runtime ClassCastException in nullSafeEval's UTF8String cast — same
  // declaration pattern as Spark's own string expressions. (Plain
  // ExpectsInputTypes validates strictly; coercion would additionally
  // need ImplicitCastInputTypes, deliberately not mixed in — a silent
  // int→string cast would change the hash domain.) Return type left
  // inferred: Spark 4 makes AbstractDataType private[sql], but
  // Seq[StringType.type] conforms.
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var acc = 7L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $a.getBytes();
         |long $acc = 7L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}
