package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: de-correlate array-membership joins.
  *
  * A join whose condition is `array_contains(l.arr, r.key)` has no equi
  * predicate, so Spark plans a nested-loop join — O(|L|·|R|) condition
  * evaluations, and with both sides large a BroadcastNestedLoopJoin that
  * either OOMs or falls back to a cartesian. But membership IS an equi
  * join in disguise: explode the array side once and join element = key.
  * This rule performs that rewrite on the LOGICAL plan so the user can
  * write the declarative form ("orders whose basket contains a watchlist
  * brand") and still get a shuffled/broadcast HASH join — the difference
  * between O(n·m) and O(n+m) work at 100 TB.
  *
  * Rewrites (array side must hold the conjunct's array, key side the
  * probe expression; `rest` = the remaining conjuncts, kept verbatim):
  *
  *  - `Inner`, array on either side:
  *    `Project(out, Join(Generate(explode(array_distinct(arr)), S), K,
  *    Inner, elem = key AND rest))`. `array_distinct` makes each (s, k)
  *    pair match exactly once, so inner multiplicity is preserved
  *    bit-for-bit.
  *  - `LeftSemi` / `LeftAnti`, array on the RIGHT: explode the right
  *    side and semi/anti join `l.key = elem AND rest`. Semi/anti ignore
  *    right-side multiplicity, so no dedup is needed; ∃(r, elem) match
  *    ⟺ ∃r match.
  *  - `LeftSemi`, array on the LEFT: tag each left row with a unique id,
  *    explode, inner join, then group back by the TAG ALONE (left
  *    columns ride the buffer via first(), which is deterministic —
  *    one tag ⟺ one left row) and drop the tag — left multiplicity
  *    survives (two identical left rows carry different tags),
  *    multi-element matches collapse to one, the aggregate exchange
  *    hashes only the 8-byte tag, and float/map left columns pass
  *    through VERBATIM (grouping on the row would -0.0/NaN-normalize
  *    floats and reject maps). `LeftAnti` with the array on the left is
  *    NOT expressible this way (a row qualifies only if ALL its
  *    elements miss) and is left untouched.
  *
  * Guards, in the narrow-match house style (a session-wide rule must
  * never change a query that merely looks similar):
  *
  *  - element/key type is an atomic non-floating type (string, integral,
  *    boolean, decimal, date, timestamp) — float/double equality differs
  *    between `array_contains` (NaN-positive semantics) and join
  *    `EqualTo`, so those stay on the slow path;
  *  - the array expression references exactly one join side, the key the
  *    other, and both are deterministic (as are the `rest` conjuncts);
  *  - null semantics are preserved for every path: a null/empty array or
  *    null key makes the original condition non-true (row dropped by
  *    inner/semi, kept by anti); after the rewrite the explode emits
  *    nothing / the equi join never matches null — the same outcome.
  *
  * The registered q80_tag_join query is the post-rewrite shape written
  * out by hand (registered queries run without session extensions);
  * ExtensionsStatefulSpec pins that the declarative spelling planned
  * through this rule produces the identical result and a Generate +
  * hash-join plan.
  */
object RewriteArrayContainsJoin extends Rule[LogicalPlan] {

  private def groupableElem(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The one membership conjunct we rewrite, plus the rest. */
  private def findMembership(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean,
      Seq[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    conjuncts.zipWithIndex.collectFirst {
      case (ac @ ArrayContains(arr, key), i)
          if ac.childrenResolved && arr.deterministic && key.deterministic &&
            arr.references.nonEmpty && key.references.nonEmpty &&
            (arr.dataType match {
              case ArrayType(et, _) => groupableElem(et)
              case _ => false
            }) &&
            ((arr.references.subsetOf(left.outputSet) &&
              key.references.subsetOf(right.outputSet)) ||
             (arr.references.subsetOf(right.outputSet) &&
              key.references.subsetOf(left.outputSet))) =>
        val arrOnLeft = arr.references.subsetOf(left.outputSet)
        (arr, key, arrOnLeft, conjuncts.patch(i, Nil, 1))
    }.filter { case (_, _, _, rest) => rest.forall(_.deterministic) }
  }

  private def exploded(arr: Expression, child: LogicalPlan,
      distinct: Boolean): (Attribute, LogicalPlan) = {
    val et = arr.dataType.asInstanceOf[ArrayType].elementType
    val elem = AttributeReference("__ac_elem", et, nullable = true)()
    val gen = Explode(if (distinct) ArrayDistinct(arr) else arr)
    (elem, Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(elem), child = child))
  }

  private def andAll(parts: Seq[Expression]): Expression =
    parts.reduce(And(_, _))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved =>
      findMembership(cond, left, right) match {
        case Some((arr, key, arrOnLeft, rest)) =>
          if (arrOnLeft) {
            val (elem, gen) = exploded(arr, left, distinct = true)
            Project(j.output, Join(gen, right, Inner,
              Some(andAll(EqualTo(elem, key) +: rest)), hint))
          } else {
            val (elem, gen) = exploded(arr, right, distinct = true)
            Project(j.output, Join(left, gen, Inner,
              Some(andAll(EqualTo(key, elem) +: rest)), hint))
          }
        case None => j
      }

    case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), hint)
        if j.resolved =>
      findMembership(cond, left, right) match {
        // array on the right: explode it; semi/anti ignore right
        // multiplicity so no distinct/dedup is needed
        case Some((arr, key, false, rest)) =>
          val (elem, gen) = exploded(arr, right, distinct = false)
          Join(left, gen, j.joinType,
            Some(andAll(EqualTo(key, elem) +: rest)), hint)
        // array on the left, semi only: tag, explode, inner join, then
        // collapse back to one row per tag. The aggregate groups on the
        // TAG ALONE — the 8-byte id is the only hashed/compared grouping
        // key — and the left columns ride the buffer via first() (all
        // rows of a group share one tag, hence one left row, so first()
        // is deterministic). Grouping on the full left row would both
        // carry it through key comparison AND normalize float grouping
        // keys (-0.0 → 0.0, NaN canonicalization), silently altering
        // semi-join OUTPUT values; first() stores values verbatim, and
        // works on map columns too (maps are un-groupable but perfectly
        // bufferable), so no type guard is needed.
        case Some((_, _, true, _)) if j.joinType == LeftAnti => j
        case Some((arr, key, true, rest)) =>
          val tag = Alias(MonotonicallyIncreasingID(), "__ac_tag")()
          val tagged = Project(left.output :+ tag, left)
          val (elem, gen) = exploded(arr, tagged, distinct = true)
          val joined = Join(gen, right, Inner,
            Some(andAll(EqualTo(elem, key) +: rest)), hint)
          val firsts = left.output.map { a =>
            Alias(new aggregate.First(a, ignoreNulls = false)
              .toAggregateExpression(), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          }
          Project(left.output,
            Aggregate(Seq(tag.toAttribute), firsts, joined))
        case _ => j
      }
  }
}
