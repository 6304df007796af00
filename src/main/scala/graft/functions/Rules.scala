package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY.md §4.2.5 demonstration, injected through
  * GraftExtensions): distance predicates of the shape
  *   sqrt(e) <  c   →  e <  c²      (c a non-negative literal)
  * and symmetric variants. sqrt is monotone on [0, ∞) and our distance
  * expressions (vec_sqdist, sums of squares) are non-negative, so the
  * rewrite is exact — and removes a transcendental per ROW from radius
  * filters (near-dup thresholds, medoid cutoffs) while keeping user code
  * free to say what it means: `filter(sqrt(d) < r)`.
  *
  * Guarded to expressions we KNOW are non-negative (vec_sqdist or
  * x*x forms); sqrt of a negative double is NaN and every comparison with
  * NaN is false in Spark semantics, while e < c² could be true — so the
  * rewrite is only safe when e ≥ 0 by construction.
  */
object SqrtComparisonRule extends Rule[LogicalPlan] {

  private def nonNegative(e: Expression): Boolean = e match {
    case _: FloatVecSqDist => true
    case Multiply(a, b, _) => a.semanticEquals(b)
    case Add(a, b, _) => nonNegative(a) && nonNegative(b)
    case _ => false
  }

  private def sq(c: Literal): Literal = {
    val v = c.value.asInstanceOf[Double]
    Literal(v * v, DoubleType)
  }

  private def nonNegLit(c: Literal): Boolean = c.value match {
    // c*c must stay finite: for c > ~1.34e154 the square overflows to
    // Infinity and `e > Infinity` is false even for e = +Infinity (an
    // overflowed sum of squares), where `sqrt(e) > c` would be true —
    // leave such extreme literals unrewritten.
    case d: java.lang.Double => d >= 0.0 && !(d * d).isInfinity
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThan(Sqrt(e), c: Literal)
        if c.dataType == DoubleType && nonNegLit(c) && nonNegative(e) =>
        LessThan(e, sq(c))
      case LessThanOrEqual(Sqrt(e), c: Literal)
        if c.dataType == DoubleType && nonNegLit(c) && nonNegative(e) =>
        LessThanOrEqual(e, sq(c))
      case GreaterThan(Sqrt(e), c: Literal)
        if c.dataType == DoubleType && nonNegLit(c) && nonNegative(e) =>
        GreaterThan(e, sq(c))
      case GreaterThanOrEqual(Sqrt(e), c: Literal)
        if c.dataType == DoubleType && nonNegLit(c) && nonNegative(e) =>
        GreaterThanOrEqual(e, sq(c))
    }
}
