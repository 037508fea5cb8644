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
}
