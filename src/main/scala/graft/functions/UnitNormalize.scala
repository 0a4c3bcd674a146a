package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: unit-normalize an array<double> column —
  * `transform(v, x -> x / sqrt(dot(v, v)))` fused into one operator that
  * computes the norm in its own first loop. The composed-Column form
  * needs an exchange barrier to stop CollapseProject inlining
  * sqrt(graft_dot(v,v)) inside the per-element division lambda (O(dim²)
  * re-evaluation); this expression removes both the barrier (no vectors
  * cross the wire) and the quadratic trap.
  *
  * Bit-compatibility: the norm accumulates left-to-right in IEEE double
  * — the identical sequence [[DotProduct]] produces — and each element
  * then goes through the same single `x / nrm` division, so the output
  * arrays are bit-identical to the composed form and the
  * normalize-then-dot DuckDB oracles keep matching (pinned in
  * DotProductSpec). Deliberate divergences, also pinned: a null ELEMENT
  * nulls the whole result (the composed form emits an array of nulls),
  * and a zero-norm vector yields NULL (the composed form emits ±Inf/NaN
  * elements that poison every downstream cosine silently).
  */
case class UnitNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_unit_normalize"
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      ss += v * v
      i += 1
    }
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) return null
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = x.getDouble(i) / nrm
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val xv = ctx.freshName("xv")
      val out = ctx.freshName("out")
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  double $xv = $a.getDouble($i);
         |  $ss += $xv * $xv;
         |}
         |if (!${ev.isNull}) {
         |  double $nrm = java.lang.Math.sqrt($ss);
         |  if ($nrm == 0.0) { ${ev.isNull} = true; }
         |  else {
         |    double[] $out = new double[$n];
         |    for (int $i = 0; $i < $n; $i++) {
         |      $out[$i] = $a.getDouble($i) / $nrm;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |      .UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnitNormalize = copy(child = newChild)
}

object UnitNormalize {
  /** Column API: fused unit normalization (input cast to array<double>). */
  def unit(v: Column): Column =
    GraftBridge.column(UnitNormalize(
      GraftBridge.expression(v.cast("array<double>"))))
}
