package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Statistical aggregates made cross-engine-exact: instead of the builtin
  * corr/stddev (whose double accumulation is partial-aggregation-order
  * dependent and can differ from another engine in the last ulps), the
  * moments Σx, Σy, Σxy, Σx², Σy² are accumulated as exact decimals and the
  * closed-form formulas evaluate in double on identical operands — so
  * Pearson correlation, sample variance, and stddev hash-match DuckDB
  * exactly. Same single-pass, map-side-combined shape as any sum. */
object Statistics {

  private def dsum2(c: Column): Column =
    sum(c.cast(DecimalType(28, 8))).cast(DoubleType)

  /** corr / variance / stddev of (o_totalprice vs per-order item count)
    * per order status, from exact decimal moments. */
  def corrStddev(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val itemCounts = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast(DoubleType).as("n_items"))
    val joined = o.join(itemCounts, o("o_orderkey") === itemCounts("l_orderkey"))
      .select(col("o_orderstatus"), col("o_totalprice").as("x"), col("n_items").as("y"))
    val n = count(lit(1)).cast(DoubleType)
    val sx = dsum2(col("x")); val sy = dsum2(col("y"))
    val sxx = dsum2(col("x") * col("x")); val syy = dsum2(col("y") * col("y"))
    val sxy = dsum2(col("x") * col("y"))
    joined.groupBy(col("o_orderstatus"))
      .agg(
        n.as("n"), sx.as("sx"), sy.as("sy"), sxx.as("sxx"), syy.as("syy"), sxy.as("sxy"))
      .select(
        col("o_orderstatus"), col("n").cast("long").as("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_price_items"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 4)
          .as("var_price"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
          .as("stddev_price"))
      .sortSmall(col("o_orderstatus"))
  }

  val corrStddevSql: String =
    """WITH ic AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_items
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT o_orderstatus, o_totalprice AS x, n_items AS y
      |  FROM orders JOIN ic ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT o_orderstatus,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      |  FROM j GROUP BY o_orderstatus)
      |SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
      |  round((sxy - sx * sy / n) /
      |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_price_items,
      |  round((sxx - sx * sx / n) / (n - 1), 4) AS var_price,
      |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_price
      |FROM m ORDER BY o_orderstatus""".stripMargin

  /** Per-group ordinary-least-squares regression of order total price on
    * per-order item count — slope, intercept, and r², closed-form from
    * the same exact-decimal moments as [[corrStddev]] (the builtin
    * regr_slope/regr_intercept accumulate doubles in partition order and
    * can never cross-engine hash-match; the moments are exact decimals,
    * the closed forms evaluate on identical operands in both engines).
    * One pass over the joined input, map-side combined — the same
    * distributed shape MLlib's linear regression summarizer uses for its
    * sufficient statistics. */
  def linregByGroup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val itemCounts = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast(DoubleType).as("n_items"))
    val joined = o.join(itemCounts, o("o_orderkey") === itemCounts("l_orderkey"))
      .select(col("o_orderstatus"), col("n_items").as("x"),
        col("o_totalprice").as("y"))
    val n = count(lit(1)).cast(DoubleType)
    joined.groupBy(col("o_orderstatus"))
      .agg(n.as("n"), dsum2(col("x")).as("sx"), dsum2(col("y")).as("sy"),
        dsum2(col("x") * col("x")).as("sxx"),
        dsum2(col("y") * col("y")).as("syy"),
        dsum2(col("x") * col("y")).as("sxy"))
      .select(
        col("o_orderstatus"), col("n").cast("long").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 4)
          .as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      .sortSmall(col("o_orderstatus"))
  }

  val linregByGroupSql: String =
    """WITH ic AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS DOUBLE) AS n_items
      |  FROM lineitem GROUP BY l_orderkey),
      |j AS (
      |  SELECT o_orderstatus, n_items AS x, o_totalprice AS y
      |  FROM orders JOIN ic ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT o_orderstatus,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      |  FROM j GROUP BY o_orderstatus)
      |SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
      |    AS intercept,
      |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM m ORDER BY o_orderstatus""".stripMargin
}
