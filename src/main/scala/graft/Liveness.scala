package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-output detector — the CI form of the pass that caught
  * scale bug five (SCALE_r11.md): a capacity cap that saturates can
  * empty an operator's OUTPUT while every oracle stays green, because
  * the oracle twins mirror the cap (SemDeDup returned 0 dups at sf1,
  * the whole co-occurrence graph tier returned empty edge sets — both
  * value-identical to DuckDB the entire time). Correctness gates catch
  * wrong values; this catches *trivially right* ones.
  *
  * A result is degenerate if it is EMPTY, or if every value in each of
  * its designated liveness columns is null or zero. Liveness columns
  * are the operator's "did it actually find anything" signals — dup
  * counts, candidate pairs, triangle counts, edge censuses — chosen
  * per query in DegenerateOutputSpec (and asserted non-degenerate at
  * the gate SF, where FIXTURES.md pins genuine signal in the data). */
object Liveness {

  /** Degeneracy flags for one result: "empty" when the frame has no
    * rows; "all-zero:<col>" per liveness column whose values are all
    * null/zero. Empty return = alive. Liveness columns must be numeric
    * (a non-null, non-zero value anywhere marks the column live). */
  def flags(df: DataFrame, liveCols: Seq[String] = Nil): Seq[String] = {
    if (df.isEmpty) return Seq("empty")
    if (liveCols.isEmpty) return Nil
    val aggs = liveCols.map(c =>
      max(when(col(c).isNotNull && col(c) =!= lit(0), 1).otherwise(0)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    liveCols.zipWithIndex.collect {
      case (c, i) if row.isNullAt(i) || row.getInt(i) == 0 => s"all-zero:$c"
    }
  }

  /** Assertion-style wrapper: throws with the query name and flags if
    * the result is degenerate. Used by specs and scale campaigns. */
  def assertAlive(name: String, df: DataFrame, liveCols: Seq[String]): Unit = {
    val f = flags(df, liveCols)
    if (f.nonEmpty)
      throw new AssertionError(
        s"degenerate output for $name: ${f.mkString(", ")} — a capacity " +
          "cap or threshold has likely saturated (SCALE_r11 bug class)")
  }
}
