package graft

import graft.tools.QueryDebug
import org.apache.spark.sql.functions._

/** Meta-test for the wide-shuffle audit: the tool that guards the
  * no-raw-columns-across-the-wire invariant must itself be proven able
  * to see a violation — review round 5 caught the audit silently passing
  * because AQE hides the plan tree behind an AdaptiveSparkPlanExec leaf. */
class AuditSpec extends SparkSpec {

  private def withAqe[T](on: Boolean)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, on.toString); body }
    finally spark.conf.set(key, prev)
  }

  test("audit detects a raw-text shuffle when AQE is off") {
    withAqe(on = false) {
      val bad = Tables.documents(spark, sf0001).repartition(col("doc_id"))
      val flagged = QueryDebug.wideShuffles(bad)
      assert(flagged.nonEmpty && flagged.head.contains("text"))
    }
  }

  test("audit passes a clean plan (narrow aggregate shuffle only)") {
    withAqe(on = false) {
      val clean = SparkEntry.queries("q66_outer_explode")(spark, sf0001)
      assert(QueryDebug.wideShuffles(clean).isEmpty)
    }
  }

  test("under AQE the same bad plan is STILL detected (inputPlan descent)") {
    // the AdaptiveSparkPlanExec root is a leaf to a naive traversal —
    // wideShuffles must descend into inputPlan or it passes vacuously
    // (the original review finding)
    withAqe(on = true) {
      val bad = Tables.documents(spark, sf0001).repartition(col("doc_id"))
      val flagged = QueryDebug.wideShuffles(bad)
      assert(flagged.nonEmpty && flagged.head.contains("text"))
    }
  }

  test("a wide column used as the partitioning KEY is not flagged") {
    withAqe(on = false) {
      // grouping by the token IS the operator (inverted index / tf
      // aggregate); the partial-aggregate exchange keys on it
      val byToken = Tables.documents(spark, sf0001)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count()
      assert(QueryDebug.wideShuffles(byToken).isEmpty)
    }
  }
}
