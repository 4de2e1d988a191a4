package graft.plans

import graft.functions.ArrayJaccard
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Logical optimization: prefilter Jaccard similarity joins by set size.
  *
  * For sets A, B: J(A,B) ≥ t implies t·|B| ≤ |A| and t·|A| ≤ |B| (the
  * classic length filter of similarity-join literature — if the sizes are too
  * different the Jaccard bound is unreachable). The rewrite augments
  * `array_jaccard(a, b) >= t` filters with the cheap size conjuncts, which
  * Catalyst can then evaluate before the expensive set intersection and push
  * independently toward each join side.
  *
  * This mirrors the role of the reference's traversal-strategy rewrites
  * (tc/graphdb/tinkerpop/optimize/AdjacentVertexFilterOptimizerStrategy.java:
  * 38-85 — turning an expensive post-filter into an indexable predicate),
  * expressed as a Catalyst `Rule[LogicalPlan]` registered through
  * `SparkSessionExtensions`.
  */
object JaccardLengthPrefilter extends Rule[LogicalPlan] {
  /** Marker to avoid re-adding conjuncts on every optimizer pass. */
  private def sizeGuard(arr: Expression, other: Expression, t: Double): Expression =
    GreaterThanOrEqual(
      Cast(Size(arr), DoubleType),
      Multiply(Literal(t), Cast(Size(other), DoubleType)))

  private def rewrite(cond: Expression): Expression = cond match {
    case gte @ GreaterThanOrEqual(ArrayJaccard(a, b), Literal(t: Double, DoubleType)) if t > 0 =>
      And(And(sizeGuard(a, b, t), sizeGuard(b, a, t)), gte)
    case gt @ GreaterThan(ArrayJaccard(a, b), Literal(t: Double, DoubleType)) if t > 0 =>
      And(And(sizeGuard(a, b, t), sizeGuard(b, a, t)), gt)
    case And(l, r) => And(rewrite(l), rewrite(r))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if cond.exists(_.isInstanceOf[ArrayJaccard]) &&
        !alreadyGuarded(cond) =>
      Filter(rewrite(cond), child)
  }

  /** A guarded condition contains Size() conjuncts we introduced; the pattern
    * `size >= t*size` does not occur in user predicates on these columns. */
  private def alreadyGuarded(cond: Expression): Boolean = cond.exists {
    case GreaterThanOrEqual(Cast(Size(_, _), DoubleType, _, _), Multiply(_, Cast(Size(_, _), DoubleType, _, _), _)) => true
    case _ => false
  }
}

/** Session extension registering graft's optimizer rules + SQL functions.
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions)... or
  * spark.sql.extensions=graft.plans.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JaccardLengthPrefilter)
  }
}
