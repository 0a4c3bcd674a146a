package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: symmetric int8 quantization of an
  * array<double> column to its canonical comma-joined string form —
  * `array_join(transform(v, x -> cast(floor(x*127/maxabs + 0.5) as int)), ",")`
  * with `maxabs = array_max(transform(v, abs))` — fused into one
  * operator so `maxabs` is computed ONCE per row by the expression's own
  * loop. The composed-Column form needs an exchange barrier to stop
  * CollapseProject inlining array_max(...) inside the per-element lambda
  * (O(dim²) re-evaluation); this expression removes both the barrier
  * (no vectors cross the wire) and the quadratic trap.
  *
  * Arithmetic is bit-identical to the composed form on non-degenerate
  * input: abs/max are order-insensitive, and each element goes through
  * the same IEEE `x*127/maxabs + 0.5 -> floor -> (int)` sequence, so the
  * DuckDB oracle keeps matching. Divergences, both deliberate and pinned
  * in DotProductSpec: a null ELEMENT nulls the whole result (array_join
  * silently skips nulls — losing a position marker is worse than a null
  * row), an all-zero vector (maxabs == 0, where the composed form's
  * ANSI int cast throws on NaN) yields NULL instead of killing the job,
  * and a NON-FINITE element (NaN or ±Infinity) likewise yields NULL —
  * NaN would silently skip the maxabs pass (`v > maxabs` is false for
  * NaN) and an Infinity would make every finite element quantize to 0
  * and itself to floor(Inf/Inf)=NaN→0, both emitting "0"s where the
  * composed form's ANSI cast throws.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_quantize_int8"
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
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(x.getDouble(i))
      if (!java.lang.Double.isFinite(v)) return null
      if (v > maxabs) maxabs = v
      i += 1
    }
    if (n > 0 && maxabs == 0.0) return null
    val sb = new java.lang.StringBuilder(n * 4)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(math.floor(x.getDouble(i) * 127 / maxabs + 0.5).toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxabs = ctx.freshName("maxabs")
      val av = ctx.freshName("av")
      val sb = ctx.freshName("sb")
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $maxabs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElemCheck
         |  double $av = java.lang.Math.abs($a.getDouble($i));
         |  if (!java.lang.Double.isFinite($av)) { ${ev.isNull} = true; break; }
         |  if ($av > $maxabs) $maxabs = $av;
         |}
         |if (!${ev.isNull} && $n > 0 && $maxabs == 0.0) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder($n * 4);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($i > 0) $sb.append(',');
         |    $sb.append((int) java.lang.Math.floor(
         |      $a.getDouble($i) * 127 / $maxabs + 0.5));
         |  }
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    $sb.toString());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8 = copy(child = newChild)
}

object QuantizeInt8 {
  /** Column API: fused int8 quantization (input cast to array<double>). */
  def quantize(v: Column): Column =
    GraftBridge.column(QuantizeInt8(
      GraftBridge.expression(v.cast("array<double>"))))
}
