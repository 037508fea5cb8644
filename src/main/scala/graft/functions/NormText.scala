package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus normalization `trim(regexp_replace(regexp_replace(
  * lower(text), "[^a-z0-9 ]", ""), " +", " "))` as ONE per-row codegen
  * expression (r20, guide §1.2 per-task work): the declarative chain runs
  * two java.util.regex passes plus a lowercase pass, each allocating an
  * intermediate string — measured 26 µs/doc at sf0.1 (+0.13 s on a 5 k-doc
  * corpus, the dominant non-floor cost of dedup_exact_normalized /
  * pipe_normalize_stats). A pure-ASCII input — every document in the
  * shipped corpora — normalizes in a single byte scan with one output
  * allocation and NO regex engine.
  *
  * Equivalence contract (pinned by `NormTextPropSpec` against the exact
  * regex chain, including non-ASCII adversaries):
  *   - ASCII fast path: lowercase A–Z, keep [a-z0-9], collapse space runs
  *     to one, drop everything else, emit no leading/trailing space. This
  *     is byte-identical to the chain because for ASCII input `lower` is
  *     the byte map, the character class strips all but [a-z0-9 ], and
  *     the collapse+trim only touch spaces.
  *   - any non-ASCII byte: fall back to the chain itself (UTF8String
  *     lowercase + the two regexes + trim), so Unicode inputs take the
  *     exact legacy semantics, 1:N lowercasings (İ → i+̇) included.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm_text"

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    NormText.norm(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormText.norm($c)")
}

object NormText {
  /** Single-pass ASCII normalization; non-ASCII falls back to the exact
    * declarative chain. Static so codegen calls it directly. */
  def norm(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c < 0) return normSlow(s) // non-ASCII byte: exact legacy chain
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') { out(o) = c; o += 1 }
      else if (c >= 'A' && c <= 'Z') { out(o) = (c + 32).toByte; o += 1 }
      else if (c == ' ' && o > 0 && out(o - 1) != ' ') { out(o) = c; o += 1 }
      i += 1
    }
    if (o > 0 && out(o - 1) == ' ') o -= 1 // trailing space from a tail run
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** The exact pre-r20 chain: Spark `lower` (UTF8String.toLowerCase) →
    * regex strip → regex collapse → trim. Only reached for non-ASCII
    * input. */
  private def normSlow(s: UTF8String): UTF8String =
    UTF8String.fromString(
      s.toLowerCase.toString
        .replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ")
        .trim)
}
