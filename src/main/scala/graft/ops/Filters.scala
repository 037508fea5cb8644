package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standalone projection/filter inventory (SURVEY.md §2b
  * "Projections/filters") — the reference has predicates only inside CASE
  * expressions (S14); these are the free-standing forms, written so every
  * conjunct is pushdown-eligible (verify: `PushedFilters` in `.explain`).
  */
object Filters {

  /** Conjunctive/disjunctive predicates + IN + LIKE + BETWEEN over lineitem. */
  def predicates(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_returnflag").isin("A", "R") &&
        col("l_quantity").between(10.0, 40.0) &&
        (col("l_discount") < 0.05 || col("l_tax") > 0.06) &&
        col("l_linestatus").like("F%"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"), col("l_quantity"),
        col("l_discount"), col("l_tax"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
      // (orderkey, linenumber, partkey, suppkey) is — full tiebreak needed
      // for a deterministic cross-engine row order.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
  }

  val predicatesSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
      |  l_quantity, l_discount, l_tax
      |FROM lineitem
      |WHERE l_returnflag IN ('A', 'R')
      |  AND l_quantity BETWEEN 10.0 AND 40.0
      |  AND (l_discount < 0.05 OR l_tax > 0.06)
      |  AND l_linestatus LIKE 'F%'
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Null-semantics filter: IS NULL / IS NOT NULL / null-safe equality over
    * the JSON-extracted nullable column. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val k = get_json_object(col("props"), "$.k").cast("int")
    e.select(col("event_id"), col("event_type"), k.as("k_int"))
      .filter(col("k_int").isNotNull && col("k_int") >= 50 &&
        col("event_type") =!= "error")
      .orderBy(col("event_id"))
  }

  val nullSemanticsSql: String =
    """SELECT event_id, event_type,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
      |  AND CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
      |  AND event_type <> 'error'
      |ORDER BY event_id""".stripMargin

  /** Pure projection with computed columns (no filter) — column pruning
    * must reduce the scan to the three referenced columns. */
  def projection(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_orderkey"),
        (col("o_totalprice") * 1.1).as("price_with_fee"),
        substring(col("o_orderpriority"), 1, 1).as("priority_code"))
      .orderBy(col("o_orderkey"))
  }

  val projectionSql: String =
    """SELECT o_orderkey, o_totalprice * 1.1 AS price_with_fee,
      |  substring(o_orderpriority, 1, 1) AS priority_code
      |FROM orders ORDER BY o_orderkey""".stripMargin
}
