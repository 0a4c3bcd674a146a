package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: nearest-centroid cell id for an
  * array<double> vector against a FIXED centroid matrix (IVF coarse
  * quantizer assignment). Computes `argmin_c |c|² − 2·v·c` (the row's
  * own norm cancels in the argmin) exactly like the composed
  * `array_min(array(struct(d, cell)...))` form it replaces — same
  * left-to-right IEEE dot accumulation, same `cSq − dot·2` combine,
  * ties keep the smallest cell index (what struct array_min's
  * lexicographic order produced). Pinned equal in DedupSimilaritySpec.
  *
  * Why native: the composed form generates one dot-product subtree per
  * centroid (k×dim literal arithmetic inlined into a giant projection)
  * that Janino recompiles on every Lloyd-iteration action; this
  * expression embeds the k×dim matrix as a reference object and
  * compiles to one tiny two-level loop. Null input or null element →
  * NULL (the fixture has neither; assignment of a degenerate vector is
  * meaningless).
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"
  override def nullable: Boolean = true

  // centroid self-norms, precomputed once per plan (not per row)
  @transient private lazy val cSq: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum)

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var j = 0
      val m = math.min(n, cent.length)
      while (j < m) { dot += x.getDouble(j) * cent(j); j += 1 }
      val d = cSq(c) - dot * 2
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids,
      "double[][]")
    val cSqRef = ctx.addReferenceObj("cSq", cSq, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val nullElemCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) { $nullElemCheck }
         |if (!${ev.isNull}) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $centRef.length; $c++) {
         |    double $dot = 0.0;
         |    int $m = java.lang.Math.min($n, $centRef[$c].length);
         |    for (int $j = 0; $j < $m; $j++) {
         |      $dot += $a.getDouble($j) * $centRef[$c][$j];
         |    }
         |    double $d = $cSqRef[$c] - $dot * 2;
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCell = copy(child = newChild)
}

object NearestCell {
  /** Column API: nearest-cell assignment against a fixed centroid
    * matrix (input cast to array<double>). */
  def nearest(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCell(
      GraftBridge.expression(v.cast("array<double>")),
      centroids.map(_.toArray).toArray))
}
