package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation inventory (SURVEY.md §2b "Set ops").
  *
  * UNION ALL is a zero-shuffle concatenation of partitions; INTERSECT /
  * EXCEPT are distinct-based and plan as aggregates/joins on the full row —
  * at 100 TB these should be keyed on as few columns as possible (done
  * here: single key column), so the shuffle carries only the key.
  */
object SetOps {

  /** UNION ALL with provenance tag. */
  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("id"), lit("supplier").as("kind"))
    c.union(s).orderBy(col("kind"), col("id"))
  }

  val unionAllSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey AS id, 'customer' AS kind FROM customer
      |  UNION ALL
      |  SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier) t
      |ORDER BY kind, id""".stripMargin

  /** INTERSECT (distinct): customer keys that actually placed orders. */
  def intersect_(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("id"))
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("id"))
    c.intersect(o).orderBy(col("id"))
  }

  val intersectSql: String =
    """SELECT c_custkey AS id FROM customer
      |INTERSECT
      |SELECT o_custkey AS id FROM orders
      |ORDER BY id""".stripMargin

  /** EXCEPT (distinct): customer keys with no orders. */
  def except_(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("id"))
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("id"))
    c.except(o).orderBy(col("id"))
  }

  val exceptSql: String =
    """SELECT c_custkey AS id FROM customer
      |EXCEPT
      |SELECT o_custkey AS id FROM orders
      |ORDER BY id""".stripMargin

  /** EXCEPT ALL — multiset difference (keeps duplicate multiplicity):
    * nation keys of customers minus nation keys of suppliers, bag
    * semantics. */
  def exceptAll_(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    c.exceptAll(s).orderBy(col("nationkey"))
  }

  val exceptAllSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT ALL
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** INTERSECT ALL — multiset intersection with multiplicity. */
  def intersectAll_(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    c.intersectAll(s).orderBy(col("nationkey"))
  }

  val intersectAllSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT ALL
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** UNION (distinct) — dedup across sources. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    c.union(s).distinct().orderBy(col("nationkey"))
  }

  val unionDistinctSql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
}
