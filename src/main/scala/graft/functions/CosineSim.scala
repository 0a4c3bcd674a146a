package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: FUSED cosine similarity of two
  * array<double> columns — `dot(a,b) / sqrt(dot(a,a)*dot(b,b))` in a
  * single generated loop accumulating all three sums at once, instead of
  * the composed form's three passes over the arrays (one [[DotProduct]]
  * each). For the similarity/dedup family, where cosine dominates the
  * candidate-verification hot loop, this cuts array traversals (and
  * array-header/null-check overhead) 3×.
  *
  * Bit-compatibility: each of the three accumulations runs left-to-right
  * in IEEE double — the identical add sequence the three separate
  * [[DotProduct]] passes produce — and the final combine uses the same
  * `/ sqrt(na * nb)` op order, so results are bit-identical to the
  * composed form (DedupSimilaritySpec pins this on random vectors) and
  * the DuckDB oracles keep matching. Null semantics also match the
  * composed form: null on null input, length mismatch, or any null
  * element. One deliberate divergence: a zero-norm side yields NULL
  * here, where the composed Column `/` THROWS under ANSI mode
  * (DIVIDE_BY_ZERO applies to doubles too) — a degenerate row must not
  * kill a 100 TB job (same rule as the when()-guarded ratio
  * denominators elsewhere; DotProductSpec pins both behaviors).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // same contract as DotProduct: analysis-time element casts + non-array
  // rejection for the SQL-registered graft_cosine path
  // (return type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
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
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      sab += xv * yv
      saa += xv * xv
      sbb += yv * yv
      i += 1
    }
    val den = math.sqrt(saa * sbb)
    if (den == 0.0) null else sab / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $sab += $xv * $yv;
         |    $saa += $xv * $xv;
         |    $sbb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double ${sab}_den = java.lang.Math.sqrt($saa * $sbb);
         |    if (${sab}_den == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $sab / ${sab}_den; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column API: fused cosine similarity (inputs cast to array<double>). */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
