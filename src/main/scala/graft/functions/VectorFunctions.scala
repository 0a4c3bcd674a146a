package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * native higher-order functions (`zip_with`/`aggregate`) — no UDFs, so the
  * expressions stay serializable-plan-side and null-safe.
  *
  * Determinism note: products and sums are computed left-to-right in array
  * order in IEEE double, which matches DuckDB's sequential list_dot_product
  * evaluation — the verify oracle relies on this (plus a final round()) for
  * bit-stable comparison.
  *
  * Scale note: each op is O(dim) per row with no shuffle; a custom codegen
  * Expression is the planned upgrade if BENCH shows the lambda-eval
  * overhead (SURVEY.md §4.3).
  */
object VectorFunctions {

  /** Dot product of two array<float|double> columns in double — backed by
    * the native codegen'd [[DotProduct]] expression (identical IEEE
    * left-to-right semantics to the HOF formulation it replaced, ~10×
    * faster in hot loops). */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** The original higher-order-function formulation, kept as the
    * pure-built-ins reference implementation (tested equal to [[dot]]). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity — backed by the FUSED native [[CosineSim]]
    * expression (one pass accumulating dot, |a|², |b|² together instead
    * of three DotProduct passes; bit-identical results, see CosineSim's
    * scaladoc). The oracle SQL uses the identical dot/sqrt(na*nb) op
    * order. */
  def cosine(a: Column, b: Column): Column = CosineSim.cosine(a, b)

  /** The composed three-pass formulation, kept as the reference
    * implementation (tested bit-equal to [[cosine]]). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v))

  /** Sign-bit signature against a fixed list of hyperplanes (random
    * hyperplane LSH for cosine similarity). Returns an int bucket id in
    * [0, 2^planes.length). Deterministic: hyperplanes are passed in.
    */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
