package graft.tools

import graft.operators.Salting
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness: AQE runtime skew-join splitting vs the static salted
  * join (`graft.operators.Salting.saltedJoin`, the q65 recipe) on a
  * deliberately skewed fact⋈dim join (SCALE.md "Skew" section; round-9
  * advice item).
  *
  * The scenario is the one both remedies exist for: a fact table where
  * one hot key carries ~30% of all rows, joined to a dim too large (or
  * declared too large) to broadcast, so the join shuffles on the key and
  * the hot key's entire volume lands on one reducer. Three variants of
  * the SAME query (join + per-attr aggregate, identical results):
  *
  *   plain  — AQE off, no salt: the degenerate baseline (one straggler
  *            reducer carries 30% of the join).
  *   aqe    — AQE on with skew-join splitting tuned to see the skew
  *            (thresholds lowered to fixture scale; at production sizes
  *            the 256 MB defaults fire by themselves).
  *   salted — AQE off, fact salted into `buckets` subkeys, dim
  *            replicated buckets× (q65's static remedy).
  *
  * Prints one JSON line with per-variant wall seconds, result agreement,
  * and whether the AQE final plan shows `skew=true` on the join node.
  *
  * Usage: SkewAB [nFactRows=20000000] [nKeys=100000] [buckets=16]
  */
object SkewAB {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val nKeys = if (args.length > 1) args(1).toInt else 100000
    val buckets = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-skew-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~30% of fact rows on hot key 0; the rest uniform over nKeys.
    // Deterministic (hash of id, seed-split), like every graft salt.
    def fact: DataFrame = spark.range(n).select(
      when(pmod(xxhash64(col("id"), lit(1)), lit(100)) < 30, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(nKeys.toLong)))
        .as("key"),
      col("id"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000)).cast("double").as("v"))
    def dim: DataFrame = spark.range(nKeys.toLong).select(
      col("id").as("key"), pmod(col("id"), lit(50)).as("attr"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("attr")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(20,1)")).cast("double").as("sv"))

    def withConfs(confs: Map[String, String])(
        body: => (DataFrame, Array[org.apache.spark.sql.Row])):
        (Double, String, Array[org.apache.spark.sql.Row]) = {
      val saved = confs.keys.map(k =>
        k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val t0 = System.nanoTime()
        val (df, rows) = body
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, df.queryExecution.executedPlan.toString, rows)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Map(
      // the scenario is "dim too big to broadcast" — forcing the
      // shuffled join is what makes the skew reachable by either remedy
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    val plainConf = noBroadcast ++ Map(
      "spark.sql.adaptive.enabled" -> "false")
    val aqeConf = noBroadcast ++ Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale thresholds: a skewed partition is one >2x median
      // and >16 MB; split targets ~8 MB. Production keeps the defaults.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
      // keep AQE from coalescing everything into few partitions first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saltedConf = plainConf

    def run(conf: Map[String, String], build: => DataFrame) =
      withConfs(conf) {
        val df = agg(build)
        (df, df.collect().sortBy(_.getLong(0)))
      }

    // warmup: JIT + codegen on a small slice (not timed)
    agg(fact.limit(1000).join(dim, "key")).collect()

    val (tPlain, _, rPlain) = run(plainConf, fact.join(dim, "key"))
    val (tAqe, planAqe, rAqe) = run(aqeConf, fact.join(dim, "key"))
    val (tSalted, _, rSalted) = run(saltedConf,
      Salting.saltedJoin(fact, dim, "key", col("id"), buckets))

    val skewApplied = planAqe.contains("skew=true")
    val agree = rPlain.sameElements(rAqe) && rPlain.sameElements(rSalted)
    println(
      s"""{"metric":"skew_ab","n_fact":$n,"n_keys":$nKeys,"buckets":$buckets,""" +
      s""""plain_sec":${f"$tPlain%.2f"},"aqe_sec":${f"$tAqe%.2f"},""" +
      s""""salted_sec":${f"$tSalted%.2f"},"aqe_skew_applied":$skewApplied,""" +
      s""""results_agree":$agree}""")
    spark.stop()
  }
}
