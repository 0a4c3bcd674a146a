package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the pure-built-ins dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  * Semantics are identical for ALL inputs (same IEEE left-to-right
  * multiply-accumulate; DotProduct mirrors the HOF's null behavior — null
  * on length mismatch or null element — pinned by DotProductSpec), but
  * the native form stays inside whole-stage codegen instead of
  * interpreted lambda evaluation (~10× in hot loops).
  *
  * The pattern binds lambda variables to each lambda's OWN parameters by
  * exprId: `(x, y) -> x * y` must multiply exactly its two (distinct)
  * arguments — in either order, IEEE multiply/add are commutative — and
  * the finish lambda must be the identity on its own argument. Near-miss
  * shapes like `(x, y) -> x * x` or `(acc, v) -> v + v` are left alone.
  * This matters because the rule is injected session-wide
  * (GraftExtensions.injectOptimizerRule): a loose match would silently
  * change results of user queries that merely resemble the idiom.
  *
  * Demonstrates the remaining Catalyst extension surface
  * (injectOptimizerRule; SURVEY.md §4.3): users writing the declarative
  * idiom get the fast path without knowing graft_dot exists.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** lf.function combines exactly lf's two distinct parameters (either
    * order) with the given commutative operator. */
  private def combinesOwnArgs(
      lf: LambdaFunction,
      lr: PartialFunction[Expression, (Expression, Expression)]): Boolean =
    lf.arguments match {
      case Seq(p0: NamedLambdaVariable, p1: NamedLambdaVariable)
          if p0.exprId != p1.exprId =>
        lr.lift(lf.function).exists { case (l, r) =>
          (l, r) match {
            case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
              (a.exprId == p0.exprId && b.exprId == p1.exprId) ||
                (a.exprId == p1.exprId && b.exprId == p0.exprId)
            case _ => false
          }
        }
      case _ => false
    }

  private def isMulOfOwnArgs(lf: LambdaFunction): Boolean =
    combinesOwnArgs(lf, { case m: Multiply => (m.left, m.right) })

  private def isAddOfOwnArgs(lf: LambdaFunction): Boolean =
    combinesOwnArgs(lf, { case a: Add => (a.left, a.right) })

  /** finish is the identity lambda `s -> s` on its own parameter. */
  private def isIdentity(lf: LambdaFunction): Boolean =
    (lf.arguments, lf.function) match {
      case (Seq(p: NamedLambdaVariable), v: NamedLambdaVariable) =>
        v.exprId == p.exprId
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Bit-exact +0.0 check: boxed `-0.0 == 0.0` is true, but a -0.0 seed
    * folds an empty array to -0.0 while DotProduct returns +0.0 — a
    * bit-level divergence hashing would see. Only the +0.0 literal seed
    * is rewritten. */
  private def isPositiveZero(zero: Any): Boolean = zero match {
    case d: java.lang.Double =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul: LambdaFunction),
            Literal(zero, DoubleType),
            add: LambdaFunction,
            finish: LambdaFunction)
          if isPositiveZero(zero) && isMulOfOwnArgs(mul) && isAddOfOwnArgs(add) &&
            isIdentity(finish) && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
