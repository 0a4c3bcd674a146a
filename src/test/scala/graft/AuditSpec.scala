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

  test("under AQE the same bad plan is INVISIBLE — why the audit session disables it") {
    // If this ever fails, Spark made adaptive plans traversable and the
    // audit's AQE-off requirement can be dropped.
    withAqe(on = true) {
      val bad = Tables.documents(spark, sf0001).repartition(col("doc_id"))
      assert(QueryDebug.wideShuffles(bad).isEmpty)
    }
  }
}
