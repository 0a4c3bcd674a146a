package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two array<double> columns,
  * with whole-stage-codegen support (SURVEY.md §4.3 — custom `Expression`
  * where the interpreted higher-order-function pipeline showed up in
  * BENCH: the all-pairs embedding near-dup dropped ~4× by replacing the
  * `aggregate(zip_with(...))` lambda chain, whose interpreted evaluation
  * costs ~µs/element, with this tight generated loop).
  *
  * Semantics: sum over i of a[i]*b[i], left-to-right in IEEE double —
  * the exact op order DuckDB's sequential list_dot_product uses, which the
  * verify oracle relies on. Null arrays propagate null; the result is ALSO
  * null when the lengths differ or any scanned element is null — exactly
  * what `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (acc,v)->acc+v)` yields
  * (zip_with pads the shorter side with nulls and a null element poisons
  * the fold), so [[graft.plans.RewriteHofDotProduct]] is semantics-
  * preserving for ALL inputs, not just dense equal-length ones.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // the SQL-registered path (graft_dot) arrives without the Column API's
  // explicit cast — declaring input types makes analysis insert the
  // element-wise cast for array<int>/array<float> and REJECT non-arrays,
  // instead of the generated getDouble() silently misreading packed ints
  // (return type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on null input, length mismatch, or null element
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      // the element null check compiles away entirely for containsNull=false
      // schemas (the common dense-embedding case) — the loop stays a tight
      // fused multiply-add
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
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
