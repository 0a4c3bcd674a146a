package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two array<double> columns,
  * with whole-stage-codegen support (SURVEY.md §4.3 — custom `Expression`
  * where the interpreted higher-order-function pipeline showed up in
  * BENCH: the all-pairs embedding near-dup dropped ~4× by replacing the
  * `aggregate(zip_with(...))` lambda chain, whose interpreted evaluation
  * costs ~µs/element, with this tight generated loop).
  *
  * Semantics: sum over i of a[i]*b[i], left-to-right in IEEE double —
  * the exact op order DuckDB's sequential list_dot_product uses, which the
  * verify oracle relies on. Null arrays propagate null (BinaryExpression
  * default); null *elements* are not expected (embedding fixtures are
  * dense) and read as 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: native dot product (inputs cast to array<double>). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
