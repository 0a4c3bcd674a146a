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

  test("AQE splits a skewed SMJ partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // the runtime counterpart of q65's static salting: one key owns ~all
    // fact rows; with aggressive skew thresholds AQE must mark and split
    // the skewed partition after the join executes
    val keys = Seq.fill(40000)(1L) ++ (2L to 2000L)
    val fact = keys.zipWithIndex
      .map { case (k, i) => (k, i.toLong, ("x" * 200) + i) }
      .toDF("k", "rid", "payload")
    val dim = (1L to 2000L).map(k => (k, s"seg$k")).toDF("k", "seg")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = fact.join(dim, Seq("k"))
      // materialize through THIS DataFrame's own QueryExecution —
      // count() would plan a separate query and leave this plan
      // unexecuted (isFinalPlan=false, no skew markers)
      assert(joined.collect().length == keys.size)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
