package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** The custom as-of join operator vs the union+window encoding (q33) and
  * hand-built vectors. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom as-of join equals the union+window encoding on events") {
    val viaCustom = queries.MiscQueries.queries("q41_asof_custom")(spark, sf001)
      .collect().map(_.toSeq).toSet
    val viaWindow = queries.RelationalQueries.queries("q33_asof_last_click")(
      spark, sf001).collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("as-of join golden vectors: backward inclusive, nulls when no match") {
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 25L, "c"),
      (2L, 6L, "d")).toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "v").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, Some("a")), // inclusive: rt == t matches
      (1L, 20L, Some("b")), // latest <= 20 is b@15
      (2L, 5L, None),       // d@6 is after 5 -> no match
      (3L, 7L, None)))      // key absent on right
  }

  test("as-of join skips null right keys/times instead of blocking the merge") {
    // Ascending sorts NULLS FIRST: a null-time right row for a key would
    // sit in front of every valid row for that key, and a null-key row in
    // front of the whole partition — the merge must consume them, not stop.
    val left = Seq((1L, 20L), (2L, 20L)).toDF("k", "t")
    val right = Seq(
      (Option.empty[Long], Option(5L), "nullkey"),
      (Option(1L), Option.empty[Long], "nulltime"),
      (Option(1L), Option(10L), "good1"),
      (Option(2L), Option(15L), "good2"))
      .toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("k", "v").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("good1"), 2L -> Some("good2")))
  }

  test("as-of join handles multiple right rows at equal time and key skew") {
    val left = (1 to 100).map(i => (1L, i.toLong * 10)).toDF("k", "t")
    val right = (1 to 50).map(i => (1L, i.toLong * 20, i)).toDF("rk", "rt", "v")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("t", "v").as[(Long, Option[Int])].collect().toMap
    assert(got(10L).isEmpty)        // before first right row (rt=20)
    assert(got(20L).contains(1))    // inclusive at 20
    assert(got(30L).contains(1))
    assert(got(1000L).contains(50)) // latest right row overall
  }

  test("as-of plan co-partitions and merges (no cartesian/window)") {
    val ev = Tables.events(spark, sf0001)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val plan = AsOf.join(errors, clicks,
      "user_id", "c_user", "ts", "c_ts")
      .queryExecution.executedPlan.toString
    // exec node prints without the Exec suffix; both inputs must arrive
    // hash-partitioned on the key and sorted by (key, time)
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan.take(600))
    assert(plan.contains("Exchange hashpartitioning(c_user"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
  }
}
