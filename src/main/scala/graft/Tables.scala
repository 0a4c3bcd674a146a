package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see /root/repo/TESTDATA.md).
  *
  * Every registered query receives `(spark, sfDir)` and reads only through
  * these helpers so the parquet scan is uniform: column pruning + predicate
  * pushdown happen in the callers' `select`/`filter`, which Catalyst pushes
  * into the `FileSourceScanExec` (visible as PushedFilters/ReadSchema in
  * `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects
    * (PARQUET_TYPE_ILLEGAL). Read nanos as long and convert to a
    * microsecond timestamp (integer `div` — double division would lose
    * precision beyond 2^53 on epoch-nanos magnitudes).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
