package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned tables make repeated co-located joins
  * shuffle-free — the 100 TB pattern for fact-fact joins that run every
  * day on the same key. */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without exchanges; results match unbucketed") {
    // warehouse dir is a static conf — set in TestSpark's builder; clear
    // leftover table locations from previous JVMs (the in-memory catalog
    // forgets them but the files survive)
    spark.sql("DROP TABLE IF EXISTS o_b")
    spark.sql("DROP TABLE IF EXISTS l_b")
    import scala.reflect.io.Directory
    Seq("o_b", "l_b").foreach { t =>
      new Directory(new java.io.File(s"/tmp/graft-test-warehouse/$t"))
        .deleteRecursively()
    }
    graft.operators.Layout.writeBucketed(
      Tables.orders(spark, sf0001), "o_b", 4, "o_orderkey",
      Seq("o_orderkey"))
    graft.operators.Layout.writeBucketed(
      Tables.lineitem(spark, sf0001), "l_b", 4, "l_orderkey",
      Seq("l_orderkey"))

    val joined = spark.table("o_b").join(spark.table("l_b"),
      col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself needs no shuffle: both sides are bucketed on the
    // key, so the only exchange left is the tiny final aggregation one
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected only the agg exchange:\n${plan.take(1200)}")

    val expected = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == expected)
  }
}
