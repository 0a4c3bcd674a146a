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
  /** Schema-adaptive `events.ts` loader. The fixture has shipped two
    * layouts so far, and the engine's contract is a session-TZ
    * `TimestampType` column either way:
    *
    *  - TIMESTAMP(NANOS) stored as int64 (fixtures up to 2026-08-13):
    *    vanilla Spark 4 rejects the nanos logical type
    *    (PARQUET_TYPE_ILLEGAL), so read nanos as long and convert with
    *    integer `div` (double division would lose precision beyond 2^53
    *    on epoch-nanos magnitudes).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (current fixtures):
    *    Spark reads TIMESTAMP_NTZ; cast to TimestampType. All entry
    *    points (Verify/Bench/tests/Main) pin the session TZ to UTC, so
    *    the NTZ wall clock becomes the same instant DuckDB's
    *    `epoch_us(ts)` sees on its naive TIMESTAMP.
    *
    * The branch is resolved in Scala from the loaded schema — zero
    * per-row cost and no `when` in the plan.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw // already TimestampType (isAdjustedToUTC=true layout)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
