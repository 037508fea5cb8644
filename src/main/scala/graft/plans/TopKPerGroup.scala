package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** A whole-operator extension: top-k rows per group as a FIRST-CLASS plan
  * node — logical node, planner strategy, and a two-phase physical
  * operator — instead of the window-function formulation
  * (`row_number().over(partitionBy(...).orderBy(...)) <= k`).
  *
  * Why bother when Spark already optimizes rank-filters into
  * `WindowGroupLimit`? The window formulation must SORT each group
  * (O(n log n) per partition, full width rows through the sort) before
  * limiting. This operator keeps a bounded heap per group
  * (O(n log k), no sort buffer), applies the same heap map-side BEFORE
  * the shuffle (partial phase, mirroring partial aggregation), so at
  * most `groups × k` rows per input partition ever reach the exchange —
  * at 100 TB the shuffle carries k rows per group per partition rather
  * than the whole table. Memory bound: `groups-per-partition × k` rows.
  *
  * The node is injected via `SparkSessionExtensions`
  * (`GraftExtensions` / `GraftFunctions.register`) and planned by
  * `TopKPerGroupStrategy`; `GraftOps.topKPerGroup` is the user API.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial (map-side) + final (post-shuffle)
  * bounded-heap operators — the aggregation-style two-phase shape. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      TopKPerGroupExec(groupExprs, order, k, partial = false,
        TopKPerGroupExec(groupExprs, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "GraftTopKPerGroup (partial)" else "GraftTopKPerGroup (final)"

  /** Final phase needs co-located groups; partial runs wherever the data
    * already is (map-side). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = RowOrdering.create(orderE, childOutput)
      // per group: max-heap on the ordering, so the WORST kept row is at
      // the head and is evicted when a better one arrives (O(log k))
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.on[UnsafeRow](identity))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) {
          heap.enqueue(toUnsafe(row).copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(toUnsafe(row).copy())
        }
      }
      heaps.valuesIterator.flatMap { h =>
        h.dequeueAll.reverseIterator // dequeueAll: worst → best; reverse
      }
    }, preservesPartitioning = true)
  }
}

/** User-facing builder for the custom operator. */
object GraftOps {

  /** Install the planner strategy (idempotent; also wired through
    * `GraftExtensions` for config-driven sessions). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerGroupStrategy
  }

  /** Top-k rows per group. `orderCols` are (name, descending?) pairs and
    * must form a TOTAL order (include a unique tiebreaker) for
    * deterministic output.
    *
    * MEMORY BOUND: each task holds one k-row heap per group it sees, all
    * on-heap with no spill path — memory is
    * O(groups-per-partition × k × row size). That is the operator's win
    * (no sort, no shuffle of dropped rows) and its constraint: with k=10
    * and 1 KiB rows, 1M distinct groups in one partition ≈ 10 GiB. For
    * group columns whose per-partition cardinality can reach that order,
    * use the window formulation (`row_number().over(Window.partitionBy...)`
    * + filter ≤ k): Spark 3.5+ plans it with WindowGroupLimit pushdown and
    * its sort spills to disk instead of OOMing the executor. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "topKPerGroup needs at least one group column (for a global top-k " +
        "use orderBy(...).limit(k), which Spark plans as TakeOrderedAndProject)")
    require(orderCols.nonEmpty, "topKPerGroup needs at least one order column")
    val spark = df.sparkSession
    install(spark)
    val analyzed = org.apache.spark.sql.graft.DatasetShim.analyzed(df)
    // Honor the session's resolver (case-insensitive by default) and fail
    // on ambiguity — first-match-by-equality would silently bind the
    // wrong attribute after a self-join with duplicate names.
    val resolver = spark.sessionState.conf.resolver
    def resolve(name: String): Attribute =
      analyzed.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous: matches ${many.mkString(", ")}")
      }
    val group = groupCols.map(resolve)
    val order = orderCols.map { case (name, desc) =>
      SortOrder(resolve(name), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graft.DatasetShim.ofRows(
      spark, TopKPerGroup(group, order, k, analyzed))
  }
}
