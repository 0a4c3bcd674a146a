package graft

import graft.queries.MiscQueries

/** The hinted queries must actually run the intended physical join —
  * otherwise they'd silently degrade to broadcast and stop covering the
  * at-scale strategies. */
class JoinStrategySpec extends SparkSpec {

  test("q44 executes a SortMergeJoin") {
    val plan = MiscQueries.queries("q44_smj_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q45 executes a ShuffledHashJoin") {
    val plan = MiscQueries.queries("q45_shuffle_hash_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(800))
  }
}
