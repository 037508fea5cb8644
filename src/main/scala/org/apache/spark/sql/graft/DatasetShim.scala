package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` construction of a DataFrame from a custom
  * LogicalPlan — the standard third-party-extension technique (a shim
  * compiled inside the `org.apache.spark.sql` package tree), needed
  * because Spark exposes `SparkSessionExtensions` for injecting custom
  * strategies but no public constructor for planting a custom logical
  * node into a Dataset. */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for building resolved
    * custom operators on top of it). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** A Column wrapping a raw Catalyst Expression — needed for expressions
    * that carry non-Expression constructor state (e.g. a `Broadcast`
    * handle), which can't ride through `call_function` registration. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst Expression behind a Column (inverse of [[column]]). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
