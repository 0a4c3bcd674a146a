package graft.streaming

import graft.core.WordCount
import graft.sink.{DocSink, DocumentStoreFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §7.4 — extension beyond the
  * bounded reference, which has no streaming at all; §1.4).
  *
  * Patterns:
  *  - file-source replay of the fixture parquet as a stream;
  *  - watermark + tumbling window aggregation (append mode: finalized
  *    windows only once the watermark passes);
  *  - streaming word count → the SAME batched document sink as batch mode,
  *    via foreachBatch — mirroring how the reference reuses
  *    FirestoreUpdateDoFn across runners (impl/BatchWriteImplementation
  *    .java:42-52). The sink's keyed idempotent upsert makes replays safe
  *    (effectively-once state).
  */
object StreamingJobs {

  /** events.parquet schema, with ts as raw nanos (long) — converted after
    * read like Tables.events. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Replay an events parquet directory as a stream. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1h window counts per event type with a 10-minute watermark.
    * Late rows beyond the watermark are dropped (documented divergence
    * from batch, where everything is seen). */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Sessionization on a stream: session_window + watermark. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Streaming exact deduplication: drop events whose `event_id` was
    * already seen — id-ONLY dedup, so a redelivered event with the same id
    * but a different ts is still dropped — with state bounded by the
    * watermark (ids older than the horizon are forgotten — the standard
    * at-scale trade: exact within the watermark, memory bounded by the
    * horizon's key count; `dropDuplicates("event_id")` without the
    * watermark bound would grow state forever).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming word count into the batched document store. Each micro-batch
    * upserts the complete current counts (complete output mode), so the
    * store converges to the same state as the batch pipeline — idempotent
    * under retry AND under re-delivery. */
  def wordCountToStore(
      spark: SparkSession,
      textStream: DataFrame,
      factory: DocumentStoreFactory,
      collection: String,
      maxBatchSize: Int = 500): StreamingQuery = {
    val counts = WordCount.countWords(textStream, "text")
    counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DocSink.writeBatched(batch, factory, collection, maxBatchSize)
        ()
      }
      .start()
  }
}
