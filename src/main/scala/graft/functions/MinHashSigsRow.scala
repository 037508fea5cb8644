package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` min-hash signature slots computed PER ROW from a
  * document's token-hash array — no explode, no aggregation, no shuffle:
  * the signature becomes a property of the scan projection, exactly like
  * `SimHash64`.
  *
  * Semantics are IDENTICAL to the aggregate formulation
  * (`MinHashSigs` over the exploded shingle table) whenever the df cap
  * does not bind: shingle hashes are the same chained xxhash64 fold the
  * SQL `xxhash64(th[i], th[i+1], th[i+2])` produces (seed 42, left fold),
  * the family member i is the same `XXH64.hashLong(sh, i)`, and min() is
  * duplicate-insensitive so skipping array_distinct changes nothing. On a
  * corpus where the df cap DOES bind, signatures here include capped
  * (boilerplate) shingles the aggregate path drops — a candidate-recall
  * difference only: the exact-Jaccard verification still scores pairs on
  * the CAPPED shingle sets, so emitted pairs are unchanged; what shifts
  * is which degenerate pairs get considered (see Dedup.minhashLsh's
  * recall note).
  *
  * Why this exists: the aggregate path re-shuffles the entire exploded
  * (doc, shingle) table a second time just to regroup it by doc — at
  * 100 TB that is a corpus-sized exchange whose only output is 512 bytes
  * per document. Per-row computation spends the same hash CPU inside the
  * scan and moves nothing. */
case class MinHashSigsRow(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs_row"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsRow =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      MinHashSigsRow.compute(a.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSigsRow.compute($a, $numHashes));""".stripMargin)
}

object MinHashSigsRow {
  /** Static hot loop (shared by eval and generated code): word-3-gram
    * shingle hashes via the chained xxhash64 fold, hash-and-min over the
    * family. Null token-hash slots cannot occur (the input is built by
    * `transform(split(...), xxhash64)` over non-null strings) but are
    * skipped defensively, matching SQL xxhash64's null-skip. */
  def compute(th: ArrayData, numHashes: Int): Array[Long] = {
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    val n = th.numElements()
    var k = 0
    while (k + 2 < n) {
      if (!th.isNullAt(k) && !th.isNullAt(k + 1) && !th.isNullAt(k + 2)) {
        var sh = 42L
        sh = XXH64.hashLong(th.getLong(k), sh)
        sh = XXH64.hashLong(th.getLong(k + 1), sh)
        sh = XXH64.hashLong(th.getLong(k + 2), sh)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(sh, i)
          if (h < sigs(i)) sigs(i) = h
          i += 1
        }
      }
      k += 1
    }
    sigs
  }
}
