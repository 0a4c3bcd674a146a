package graft

import graft.functions.{CosineSim, DotProduct, NearestCell, QuantizeInt8, UnitNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions in the session FunctionRegistry so the pure-SQL surface can
  * use them (`SELECT graft_dot(a, b) FROM ...`).
  *
  * Wire up with either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
        DotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"graft_cosine requires exactly 2 arguments, got ${exprs.length}")
        CosineSim(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_unit_normalize"),
      new ExpressionInfo(classOf[UnitNormalize].getName,
        "graft_unit_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1,
          s"graft_unit_normalize requires exactly 1 argument, got ${exprs.length}")
        UnitNormalize(exprs(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1,
          s"graft_quantize_int8 requires exactly 1 argument, got ${exprs.length}")
        QuantizeInt8(exprs(0))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"graft_nearest_cell requires exactly 2 arguments, got ${exprs.length}")
        // the centroid matrix must be a literal (model state, not data):
        // fold it at resolution time into the expression's Seq field
        require(exprs(1).foldable,
          "graft_nearest_cell: second argument (centroid matrix) must be a literal")
        // toDoubleArray() below blindly reads double slots — an int-element
        // literal like array(array(1, 2)) would surface as a raw
        // ClassCastException at analysis. Check the declared type first
        // (ImplicitCastInputTypes only coerces the first argument).
        exprs(1).dataType match {
          case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, _), _) => ()
          case dt => throw new IllegalArgumentException(
            "graft_nearest_cell: second argument must be an " +
              s"array<array<double>> literal (e.g. array(array(1.0d, 2.0d))), " +
              s"got ${dt.simpleString}")
        }
        val m = exprs(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(exprs(1).dataType
                .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
              .toSeq.map {
                case row: org.apache.spark.sql.catalyst.util.ArrayData =>
                  // element-wise read instead of toDoubleArray(): a null
                  // element would NPE there; make it the same typed error
                  // as every other malformed-literal case
                  (0 until row.numElements()).map { i =>
                    if (row.isNullAt(i)) throw new IllegalArgumentException(
                      "graft_nearest_cell: centroid matrix must not " +
                        "contain null elements")
                    row.getDouble(i)
                  }
                case null => throw new IllegalArgumentException(
                  "graft_nearest_cell: centroid matrix must not contain " +
                    "null rows")
                case other => sys.error(
                  s"graft_nearest_cell: expected array<array<double>>, got $other")
              }
          case other => sys.error(
            s"graft_nearest_cell: expected array<array<double>> literal, got $other")
        }
        NearestCell(exprs(0), m)
      }))
    // aggregate(zip_with(a,b,*), 0.0, +) -> native DotProduct
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    // Filter(levenshtein(l,r) <= k) -> banded threshold form
    e.injectOptimizerRule(_ => graft.plans.RewriteThresholdLevenshtein)
    // Join(... array_contains(arr, key) ...) -> explode + equi join
    e.injectOptimizerRule(_ => graft.plans.RewriteArrayContainsJoin)
  }
}
