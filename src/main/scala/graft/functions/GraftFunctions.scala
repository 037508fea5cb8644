package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.expr

/** Registration for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster-wide install, the production route);
  *  - `GraftFunctions.register(spark)` for sessions that already exist
  *    (idempotent; used by the inventory queries so Verify/Bench sessions
  *    pick the functions up without special configuration).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_vec_dot" -> { args => FloatVectorDot(args(0), args(1)) }
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Dot product of two float-vector columns (see FloatVectorDot). The
    * session must have called `register` (inventory queries do). */
  def vecDot(a: Column, b: Column): Column =
    expr(s"graft_vec_dot(${a.toString}, ${b.toString})")
}

/** SparkSessionExtensions installer: injects graft's native functions at
  * session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
  }
}
