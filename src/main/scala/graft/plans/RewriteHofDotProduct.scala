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
  * Semantics are identical by construction (same IEEE left-to-right
  * multiply-accumulate — pinned by DotProductSpec), but the native form
  * stays inside whole-stage codegen instead of interpreted lambda
  * evaluation (~10× in hot loops).
  *
  * Demonstrates the remaining Catalyst extension surface
  * (injectOptimizerRule; SURVEY.md §4.3): users writing the declarative
  * idiom get the fast path without knowing graft_dot exists.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression): Boolean =
    e.isInstanceOf[NamedLambdaVariable]

  private object MulLambda {
    def unapply(lf: LambdaFunction): Boolean = lf.function match {
      case m: Multiply => isVar(m.left) && isVar(m.right)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(lf: LambdaFunction): Boolean = lf.function match {
      case a: Add => isVar(a.left) && isVar(a.right)
      case _ => false
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul: LambdaFunction),
            Literal(zero, DoubleType),
            add: LambdaFunction,
            finish: LambdaFunction)
          if zero == 0.0 && MulLambda.unapply(mul) && AddLambda.unapply(add) &&
            isVar(finish.function) && isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
