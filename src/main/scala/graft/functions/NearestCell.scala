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
  * compiles to one tiny two-level loop. Null input, null element, or a
  * vector whose length differs from the centroid dimension → NULL
  * (assignment of a degenerate vector is meaningless; the composed form
  * would produce a null-poisoned struct ordering instead — a
  * deliberate, spec-pinned divergence, same doctrine as QuantizeInt8).
  *
  * `centroids` is a Seq-of-Seq so the case class gets STRUCTURAL
  * equality — with raw arrays two identical expressions would fail
  * semanticEquals and defeat subexpression elimination.
  */
case class NearestCell(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  // Validated at construction so interpreted eval and codegen can share
  // one unguarded inner loop: a ragged matrix would make eval throw
  // ArrayIndexOutOfBounds where codegen (formerly Math.min-clamped)
  // silently computed a partial dot — results depending on the execution
  // path the planner picked. An empty matrix would make the degenerate
  // empty-vector row "nearest" to cell 0 instead of erroring.
  require(centroids.nonEmpty,
    "graft_nearest_cell: centroid matrix must be non-empty")
  require(centroids.forall(_.length == centroids.head.length),
    "graft_nearest_cell: centroid matrix must be rectangular " +
      s"(row lengths ${centroids.map(_.length).distinct.mkString(",")})")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"
  override def nullable: Boolean = true

  // array form + self-norms, computed once per plan (not per row)
  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cSq: Array[Double] =
    cents.map(c => c.map(x => x * x).sum)
  @transient private lazy val dim: Int =
    if (cents.isEmpty) 0 else cents(0).length

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getDouble(j) * cent(j); j += 1 }
      val d = cSq(c) - dot * 2
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", cents,
      "double[][]")
    val cSqRef = ctx.addReferenceObj("cSq", cSq, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      // omit the guard loop entirely when elements cannot be null —
      // an empty-bodied n-iteration loop is dead work per row
      val nullElemLoop =
        if (elementsNullable)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) { ${ev.isNull} = true; }
         |$nullElemLoop
         |if (!${ev.isNull}) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $centRef.length; $c++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
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
      GraftBridge.expression(v.cast("array<double>")), centroids))
}
