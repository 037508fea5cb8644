package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2b "Sorts/limits/top-k").
  *
  * `orderBy(...).limit(k)` is planned by Spark as `TakeOrderedAndProject`:
  * each partition keeps only its local top-k and the driver merges k×p rows
  * — no global sort, no full shuffle. That is THE scale-correct top-k; a
  * global `orderBy` without limit appears only in Verify output ordering
  * (tiny results), never over a fact table.
  */
object SortsLimits {

  /** Global top-100 lineitems by price, fully tie-broken. */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // (l_orderkey, l_linenumber) is not unique in the synthetic lineitem;
    // include partkey/suppkey so the order (and hence the top-100 cut) is
    // fully deterministic in both engines.
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .limit(100)
  }

  val topKSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
      |LIMIT 100""".stripMargin

  /** Multi-column mixed-direction sort with limit. */
  def multiColSort(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc, col("o_orderdate").desc, col("o_orderkey").asc)
      .limit(50)
  }

  val multiColSortSql: String =
    """SELECT o_orderkey, o_orderstatus, o_orderdate, o_totalprice
      |FROM orders
      |ORDER BY o_orderstatus ASC, o_orderdate DESC, o_orderkey ASC
      |LIMIT 50""".stripMargin

  /** Bottom-k with a filter first (filter is pushed to the parquet scan —
    * check `.explain` for PushedFilters). */
  def filteredBottomK(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_acctbal") < 0.0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").asc, col("c_custkey"))
      .limit(25)
  }

  val filteredBottomKSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal < 0.0
      |ORDER BY c_acctbal ASC, c_custkey LIMIT 25""".stripMargin

  /** Globally-ordered sink pattern — the ONLY scale-safe total order:
    * `repartitionByRange` on the sort key (range exchange: each partition
    * holds a contiguous, disjoint key range in partition-index order) +
    * `sortWithinPartitions` (parallel per-partition sorts). A plain
    * `orderBy` on a fact table funnels everything through range exchange
    * TOO — but a sorted WRITE needs exactly this pair and nothing more,
    * and no step ever materializes the whole order on one node.
    *
    * The emitted result is the per-month MANIFEST CENSUS such a sorted
    * write would record (rows, min/max key, exact quantity checksum per
    * range) — computed in a `mapPartitions` pass that ASSERTS the
    * within-partition sort order row by row, so the query output is
    * evidence the layout really is sorted (an unsorted partition throws,
    * it does not mis-census; and sitting above mapPartitions, the sort
    * cannot be optimized away). Range boundaries come from sampling and
    * are not deterministic — the census is per month BIN, which is
    * boundary-independent, so the result hash-matches a plain GROUP
    * BY/ORDER BY DuckDB twin. Quantity sums ride as exact 4-dp cents
    * (longs; overflow at ~2⁶³ ≈ 10¹⁴ rows × max-50 quantity — safe
    * beyond 100 TB) and convert to double through decimal division,
    * matching the oracle's DECIMAL sum → DOUBLE cast bit-exactly. */
  def globalRangedSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.lineitem(spark, dir)
      .select(
        expr("year(cast(l_shipdate as date)) * 12 + month(cast(l_shipdate as date)) - 1")
          .as("rid"),
        expr("unix_date(cast(l_shipdate as date))").as("d"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val sorted = keyed
      .repartitionByRange(32, col("d"), col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("d"), col("l_orderkey"), col("l_linenumber"))
      .as[(Int, Int, Long, Int, Double)]
    sorted.mapPartitions { it =>
      var lastD = Int.MinValue; var lastO = Long.MinValue; var lastL = Int.MinValue
      // rid -> (n, minD, maxD, cents); insertion-ordered but re-merged below
      val acc = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Int, Int, Long)]
      it.foreach { case (rid, d, o, l, q) =>
        val ok = d > lastD ||
          (d == lastD && (o > lastO || (o == lastO && l >= lastL)))
        require(ok, s"global ranged sort violated at (day=$d, order=$o, line=$l)")
        lastD = d; lastO = o; lastL = l
        val cents = java.math.BigDecimal.valueOf(q).movePointRight(4).longValueExact()
        acc.get(rid) match {
          case Some((n, mn, mx, c)) =>
            acc(rid) = (n + 1, math.min(mn, d), math.max(mx, d), c + cents)
          case None => acc(rid) = (1L, d, d, cents)
        }
      }
      acc.iterator.map { case (rid, (n, mn, mx, c)) => (rid, n, mn, mx, c) }
    }.toDF("rid", "n", "min_d", "max_d", "cents")
      // a month bin can straddle two adjacent range partitions — merge
      .groupBy(col("rid"))
      .agg(sum(col("n")).as("n_rows"), min(col("min_d")).as("min_d"),
        max(col("max_d")).as("max_d"), sum(col("cents")).as("cents"))
      .select(col("rid").cast("long").as("range_id"), col("n_rows"),
        date_from_unix_date(col("min_d")).cast("string").as("min_ship"),
        date_from_unix_date(col("max_d")).cast("string").as("max_ship"),
        (col("cents").cast("decimal(38,4)") / lit(10000)).cast("double").as("sum_qty"))
      .orderBy(col("range_id"))
  }

  val globalRangedSortSql: String =
    """SELECT CAST(year(d0) * 12 + month(d0) - 1 AS BIGINT) AS range_id,
      |  COUNT(*) AS n_rows,
      |  CAST(MIN(d0) AS VARCHAR) AS min_ship,
      |  CAST(MAX(d0) AS VARCHAR) AS max_ship,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM (SELECT CAST(l_shipdate AS DATE) AS d0, l_quantity FROM lineitem) t
      |GROUP BY 1 ORDER BY range_id""".stripMargin
}
