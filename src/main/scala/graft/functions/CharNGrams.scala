package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (custom Catalyst `Generator`): emits every
  * character n-gram of a string as its own output row, LAZILY.
  *
  * The declarative equivalent —
  * `explode(transform(sequence(0, length(s)-n), i -> substring(s, i+1, n)))`
  * — materializes the full gram ARRAY per row before the explode: for a
  * 1 MB document and n = 3 that is a ~3 MB transient array per row, and
  * the whole array lives in the row until `Generate` consumes it. A
  * Generator hands `Generate` an iterator instead, so grams stream
  * straight into downstream partial aggregation with O(n) live bytes per
  * row regardless of document size — the difference between bounded and
  * document-sized memory on a long-document corpus.
  *
  * Character semantics: n-grams are over Unicode code units of the
  * decoded string (equivalent to code points for the ASCII/BMP corpora
  * this inventory targets), matching DuckDB's character-based `substr` in
  * the oracle twin. */
case class CharNGrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"n-gram size must be positive, got $n")

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_char_ngrams"

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Iterator.empty
      else (0 to s.length - n).iterator
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }
}
