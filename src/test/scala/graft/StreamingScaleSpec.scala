package graft

import graft.streaming.StreamingJobs
import graft.tools.GenData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** sf1-VOLUME streaming replay (round-10 scale evidence): the full
  * 1,000,000-row sf1 events table — generated in-process by GenData's
  * pure per-id generator, bit-identical to what `GenData <dir> 1.0`
  * writes — replayed through the stream-stream attribution join and
  * the stream-static PIT lookup via the real file-source path
  * (time-ordered parquet chunks, one per micro-batch).
  *
  * Two pins per job, both of which only MEAN something at volume:
  *  1. stream == batch on the full sf1 input (the fixture-scale pins in
  *     StreamingSpec replay 1k events; this is 1000×);
  *  2. the state contract: attribution state tracks the 30m+30m
  *     watermark horizon — thousands of rows against a million ingested
  *     (an unbounded join would hold every click/purchase seen) — and
  *     the PIT lookup holds ZERO state rows (stream-static joins probe
  *     the static side per batch; nothing is buffered).
  */
class StreamingScaleSpec extends SparkSpec {
  import spark.implicits._

  private val nChunks = 40

  // sf1 events as a batch fixture dir (events.parquet), for the batch
  // side of the stream==batch pins
  private lazy val sf1Dir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sf1ev").toString
    val sz = GenData.Sizes(1.0)
    spark.range(sz.nEvents).map(GenData.event(_, sz)).toDF()
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // the same table as 40 time-ordered single-file chunks (+2 sentinel
  // chunks that flush the final watermark) — ~25k events per micro-batch
  private lazy val replayDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sf1rp").toString
    StreamingJobs.writeReplayChunks(spark, sf1Dir, dir, chunks = nChunks)
    dir
  }

  /** Run `query` named `name` to completion while a listener samples
    * (numInputRows, state rows) at every progress event; returns the
    * samples. */
  private def runSampled(name: String,
      start: () => org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[(Long, Long)] = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == name) samples.synchronized {
          samples += ((e.progress.numInputRows,
            e.progress.stateOperators.map(_.numRowsTotal).sum))
        }
    }
    spark.streams.addListener(listener)
    try {
      val q = start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.streams.removeListener(listener)
    // processAllAvailable blocks until all progress is committed, but the
    // listener bus is async — drain it
    var waited = 0
    while (samples.synchronized(samples.map(_._1).sum) < 1000000L &&
           waited < 100) { Thread.sleep(100); waited += 1 }
    samples.synchronized(samples.toSeq)
  }

  test("sf1 replay: stream-stream attribution == batch q71 on 1M events; " +
      "state tracks the watermark horizon, not input size") {
    val samples = runSampled("sf1_attrib", () =>
      StreamingJobs.attributionStream(
          StreamingJobs.eventsReplayStream(spark, replayDir))
        .writeStream.outputMode("append").format("memory")
        .queryName("sf1_attrib").start())
    val streamed = spark.table("sf1_attrib")
      .filter(col("user_id") >= 0)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q71_attribution")(spark, sf1Dir)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("lag_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "sf1 input produced no attribution pairs")
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${streamed.diff(batch).take(3)} " +
        s"onlyBatch=${batch.diff(streamed).take(3)}")
    // state contract at volume: a million rows went through, the state
    // store held at most the join-relevant rows inside roughly one
    // chunk-span + horizon of event time. Unbounded buffering would
    // approach the ~400k cumulative click+purchase rows; the measured
    // peak sits orders of magnitude under it. Bound chosen at 10% of
    // cumulative relevant rows — loose enough for chunk-boundary
    // timing, tight enough that ANY unbounded growth trips it.
    val totalInput = samples.map(_._1).sum
    val peakState = samples.map(_._2).max
    info(s"attribution: ${streamed.size} pairs, $totalInput rows ingested, " +
      s"peak state $peakState rows, final state ${samples.last._2}")
    assert(totalInput >= 1000000L, s"replay ingested only $totalInput rows")
    assert(peakState < 40000L,
      s"attribution state grew past the horizon: peak $peakState rows")
    // and the sentinel chunks flushed it back down at the end
    assert(samples.last._2 < peakState || samples.last._2 < 1000,
      s"final state ${samples.last._2} did not drain")
  }

  test("sf1 replay: stream-static PIT lookup == batch q72 on 1M events " +
      "with ZERO buffered state") {
    val dim = graft.queries.ExtraRelationalQueries
      .scd2PitDim(Tables.events(spark, sf1Dir))
    val samples = runSampled("sf1_pit", () =>
      StreamingJobs.pitServe(
          StreamingJobs.eventsReplayStream(spark, replayDir), dim)
        .writeStream.outputMode("append").format("memory")
        .queryName("sf1_pit").start())
    val streamed = spark.table("sf1_pit")
      .filter(col("user_id") >= 0)
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.queries("q72_pit_join")(spark, sf1Dir)
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "sf1 input produced no PIT matches")
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${streamed.diff(batch).take(3)} " +
        s"onlyBatch=${batch.diff(streamed).take(3)}")
    // stream-static joins buffer nothing: every micro-batch probes the
    // static dimension and forgets — O(1) state forever
    val totalInput = samples.map(_._1).sum
    assert(totalInput >= 1000000L, s"replay ingested only $totalInput rows")
    assert(samples.forall(_._2 == 0L),
      s"PIT lookup buffered state: ${samples.filter(_._2 > 0).take(3)}")
  }
}
