package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, GreaterThan, GreaterThanOrEqual, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `row_number().over(partitionBy p orderBy o) <= k` →
  * [[TopKPerGroup]] under the window.
  *
  * The window-rank-filter idiom is how users write top-k-per-group, and
  * it shuffles + fully SORTS every input row before the filter throws
  * almost all of them away — the dominant cost at 100 TB. This rule
  * feeds the window from the partial/final heap operator instead: only
  * ≤ k rows per group per partition survive to the shuffle, and the
  * window then ranks the tiny survivor set (row_number over exactly the
  * top-k rows assigns the same 1..k, so the rewrite is semantics-
  * preserving; with ties under a non-total order both plans pick an
  * arbitrary — equally valid — k subset).
  *
  * Fires only on: a single row_number window expression, a `rn <= k` /
  * `rn < k` / `rn = 1` (or reversed) conjunct-free filter directly
  * above it, and
  * k ≤ [[WindowTopKRule.MaxK]] (heaps hold k rows per group in memory).
  * Idempotent: skips when the window child is already a same-keyed
  * TopKPerGroup with a no-larger k (the hand-written
  * [[TopK.perGroup]] + rank pattern). */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** Above this k the per-group heaps stop being obviously cheaper than
    * the sort; leave the plan alone. */
  val MaxK = 10000

  private def boundFromFilter(cond: Expression, rnAttr: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnAttr) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnAttr) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rnAttr) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rnAttr) => Some(k - 1)
      // rn = 1 is the argmax idiom: row_number is always >= 1, so the
      // equality IS a top-1 filter (rn = k for k > 1 selects a middle
      // rank and must keep the full sort)
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rnAttr) => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rnAttr) => Some(1)
      case _ => None
    }

  // strips Projects AND Filters: predicate pushdown may slide a
  // partition-key filter (e.g. join-inferred isnotnull) between the
  // window and an already-placed heap across fixed-point iterations —
  // without stripping it the guard re-wraps and double-heaps the plan.
  // Stripping is safe here: the guard only ever SKIPS the rewrite.
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, c) => stripProjects(c)
    case Filter(_, c) => stripProjects(c)
    case other => other
  }

  private def sameKeys(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  private def sameOrder(a: Seq[SortOrder], b: Seq[SortOrder]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.child.semanticEquals(y.child) && x.direction == y.direction &&
        x.nullOrdering == y.nullOrdering
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      val rewritten = for {
        alias <- w.windowExpressions match {
          case Seq(a: Alias) => Some(a)
          case _ => None // other window fns need the full partition
        }
        _ <- alias.child match {
          case WindowExpression(RowNumber(), _) => Some(())
          case _ => None
        }
        k <- boundFromFilter(cond, alias.toAttribute)
        if k > 0 && k <= MaxK
        if w.orderSpec.nonEmpty
        // idempotency: the child may already be a hand-placed heap
        // (possibly behind column-pruning Projects)
        if !(stripProjects(w.child) match {
          case t: TopKPerGroup =>
            sameKeys(t.groupKeys, w.partitionSpec) && t.k <= k
          case _ => false
        })
      } yield f.copy(child = w.copy(child =
        TopKPerGroup(w.partitionSpec, w.orderSpec, k, w.child)))
      rewritten.getOrElse(f)
  }
}
