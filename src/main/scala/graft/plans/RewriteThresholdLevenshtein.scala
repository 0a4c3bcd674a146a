package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded edit-distance filters
  *
  *   Filter(levenshtein(l, r) <= k)         (and the <, >=-flipped spellings)
  *
  * into the threshold form Spark's Levenshtein expression already ships
  *
  *   Filter(levenshtein(l, r, k) >= 0)
  *
  * The 3-arg form runs a banded O(k·n) dynamic program with early abort
  * and returns −1 past the threshold, versus the full O(n·m) matrix of
  * the 2-arg form — at verification thresholds (k ≪ n, the
  * dedup_editdist_passjoin shape) that is a ~n/(2k+1) cut in DP cells
  * per pair. Semantics are identical for ALL inputs:
  *
  *  - non-null strings: dist ≤ k  ⟺  bounded result ∈ [0, k]  ⟺  ≥ 0
  *    (the bounded form never returns a value above its threshold);
  *  - any null operand: both spellings evaluate to null, so a Filter
  *    drops the row either way.
  *
  * Scope: `Filter` conditions and `Join` conditions (the residual of an
  * edit-distance similarity join — `df.join(other,
  * levenshtein($"a",$"b") <= 3)` — evaluates the condition per candidate
  * pair, exactly where the banded form pays most), and only comparisons
  * against a non-negative integer LITERAL (k ≥ 1; `lev < k` needs
  * k ≥ 2 so the shifted threshold stays ≥ 1). The two spellings agree
  * as THREE-VALUED predicates (true/false/null) on every input, so the
  * rewrite is safe in any condition context — including outer joins,
  * where a non-true condition preserves rather than drops the row. A
  * levenshtein whose value is PROJECTED (`withColumn("dist", ...)`) is
  * untouched — there the caller wants the unbounded distance, and the
  * comparison downstream references the attribute, not this
  * expression. Like
  * [[RewriteHofDotProduct]] this is injected session-wide
  * (GraftExtensions), so the match is deliberately narrow: a loose
  * rewrite would silently change user queries that merely look similar.
  */
object RewriteThresholdLevenshtein extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l, r, Some(Literal(k, IntegerType))), Literal(0, IntegerType))

  private def rewrite(cond: Expression): Expression = cond transform {
    case LessThanOrEqual(lev @ Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 1 && lev.childrenResolved =>
      bounded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 1 =>
      bounded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 2 =>
      bounded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 2 =>
      bounded(l, r, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
