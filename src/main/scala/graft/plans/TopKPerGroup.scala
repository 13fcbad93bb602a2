package graft.plans

import scala.jdk.CollectionConverters._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shims

/** Whole-operator top-k-per-group — the scalable replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` idiom.
  *
  * The window form shuffles and SORTS every input row; at 100 TB of
  * scored candidates that sort dominates the job. This operator splits
  * the work like HashAggregate does: a PARTIAL pass keeps a bounded
  * k-heap per group per partition (map-side, O(n log k), no sort, no
  * materialization), then only ≤ k·groups·partitions surviving rows
  * shuffle to a FINAL per-group heap. EnsureRequirements inserts that
  * exchange automatically from the final operator's required
  * ClusteredDistribution — exactly how the built-in partial/final
  * aggregate pair composes.
  *
  * Determinism: callers pass a TOTAL ordering (tie-broken by a unique
  * id); with a total order the heap contents are unique, so partial →
  * final commutes and results are engine-reproducible. */
case class TopKPerGroup(groupKeys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical top-k heap pass. `partial = true` runs on whatever
  * partitioning the child has (map-side); `partial = false` requires
  * clustering by the group keys, giving exact per-group top-k. */
case class TopKPerGroupExec(groupKeys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupKeys, false, None))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = groupKeys
    val order = ordering
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = GenerateOrdering.generate(order, childOutput)
      // max-heap under the ordering: head is the WORST retained row, so
      // a better row evicts it in O(log k)
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, revCmp)
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial + final exec pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, child) =>
      TopKPerGroupExec(keys, order, k, partial = false,
        TopKPerGroupExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point. */
object TopK {
  /** Top-k rows per group of `keys` under `orderBy` (which must be a
    * total order for deterministic results — tie-break on a unique id).
    * Output rows keep the input schema; per-group order is NOT
    * guaranteed — apply a final orderBy/rank on the (tiny) result. */
  def perGroup(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    // self-register on sessions built without GraftExtensions
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val sortOrders = orderBy.map(c => Shims.expression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Shims.ofRows(df.sparkSession,
      TopKPerGroup(keys.map(Shims.expression), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
