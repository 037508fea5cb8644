package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF (SURVEY.md §2b "UDF/UDAF/UDTF"): price-weighted
  * average discount as an `Aggregator[IN, BUF, OUT]` registered through
  * `functions.udaf`.
  *
  * Deterministic by construction: per-row doubles are converted to
  * BigDecimal at scale 4 (same rounding as `CAST(x AS DECIMAL(18,4))`),
  * so the merge is exact and order-independent across partitions — which
  * is what makes this UDAF oracle-checkable in DuckDB, unlike a naive
  * double-summing aggregator whose result depends on partial-aggregation
  * order. The same discipline any distributed UDAF needs at 100 TB:
  * a commutative, associative, exactly-mergeable buffer.
  */
object CustomAgg {

  case class WBuf(weightedSum: BigDecimal, weightSum: BigDecimal)

  /** weighted = Σ round4(p·d) / Σ round4(p) — both sums exact decimals. */
  object WeightedAvgDiscount extends Aggregator[(Double, Double), WBuf, Double] {
    private def d4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    override def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
    override def reduce(b: WBuf, in: (Double, Double)): WBuf = {
      val (price, discount) = in
      WBuf(b.weightedSum + d4(price * discount), b.weightSum + d4(price))
    }
    override def merge(a: WBuf, b: WBuf): WBuf =
      WBuf(a.weightedSum + b.weightedSum, a.weightSum + b.weightSum)
    override def finish(b: WBuf): Double =
      if (b.weightSum == 0) 0.0
      else b.weightedSum.toDouble / b.weightSum.toDouble
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Price-weighted average discount per return flag, via the custom UDAF. */
  def weightedAvgDiscount(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvgDiscount)
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_discount")).as("weighted_avg_discount"),
        count(lit(1)).as("n_rows"))
      .sortSmall(col("l_returnflag"))
  }

  val weightedAvgDiscountSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |    AS weighted_avg_discount,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
