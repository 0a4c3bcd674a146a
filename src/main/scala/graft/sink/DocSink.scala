package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator

/** The reference's two sink strategies (its raison d'être), Spark-first.
  *
  * Reference: naive = one client + one blocking RPC per element
  * (/root/reference/src/main/java/org/rm3l/beam/firestore/impl/NaiveImplementation.java:38-73);
  * batch = one client per bundle + buffered flushes of ≤ maxBatchSize
  * (default 500 = Firestore's max ops/commit,
  * FirestoreUpdateDoFn.java:19,37-95).
  *
  * Spark mapping: a sink is an action, not a plan node — `foreachPartition`
  * gives the exact `@StartBundle`/`@ProcessElement`/`@FinishBundle`
  * lifecycle (client per partition, buffer, flush, close). We implement the
  * *intended* atomic-batch semantics (SURVEY.md §2.1 fidelity note):
  * `iterator.grouped(batchSize)` → one atomic `commitBatch` per group. The
  * upsert is keyed (last-write-wins) so task retries are safe.
  *
  * Scale note (100 TB): writes are fully partition-parallel, the driver only
  * ships the serializable factory closure, and nothing is collected. Batch
  * size bounds per-partition memory at O(batchSize) buffered rows. At
  * 1000-executor scale, parallelism against a remote store is governed by
  * the number of partitions — `repartition(n)` upstream is the throttle.
  */
object DocSink {

  /** Order-insensitive fingerprint of a flush's CONTENT — the content
    * term of feed-idempotency keys (see writeBatched's scaladoc). Doc
    * encodings are length-prefixed (ids/fields may contain any
    * character) and sorted before hashing, so the same doc set in any
    * iteration order fingerprints identically; SHA-256 (not a 32-bit
    * hashCode — review round-16: a hashCode collision between two
    * DIFFERENT flush contents would wrongly suppress the differing
    * retry's feed entry, i.e. silent feed loss) truncated to 64 bits. */
  private[graft] def contentKey(
      docs: Seq[(String, Map[String, Long])]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    docs.map { case (id, fields) =>
      s"${id.length}:$id=" + fields.toSeq.sorted
        .map { case (k, v) => s"${k.length}:$k:$v" }.mkString(",")
    }.sorted.foreach { s =>
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    md.digest().take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Batched sink — intended O7 semantics. Expects a 2-column DataFrame
    * (docId: string, value: long); writes `{fieldName: value}` keyed by
    * docId, flushing atomically every `batchSize` docs, remainder at close.
    * Returns (documents written, batches committed) via accumulators.
    *
    * Feed-idempotency semantics (the store's change feed is the one
    * non-idempotent side effect; doc upserts are always last-write-wins):
    * each flush commits under key jobKey/partition/ordinal/contentHash.
    * The CONTENT HASH term matters under retry (review round-16): a
    * re-fetched shuffle partition may iterate in a different order, so
    * ordinal f0 of attempt 2 can hold different docs than attempt 1's
    * published f0 — without the hash, attempt 2's f0 would be suppressed
    * by attempt 1's marker and its docs would be durable in the store
    * yet MISSING from the feed forever. With it: exactly-once per flush
    * when partition order is deterministic, and at-least-once (possible
    * duplicates, never loss) when it is not — safe for the feed's
    * consumers, which apply keyed last-write-wins upserts.
    *
    * `jobKey`: None (default) generates a fresh driver-side UUID — right
    * for one-shot batch jobs (stable across task retries of the same
    * job, unique across jobs). Streaming foreachBatch callers must pass
    * a checkpoint-stable key (e.g. "<sink-name>/b<batchId>") so a
    * micro-batch RE-EXECUTED after a restart does not republish its
    * feed entries; one logical writer per collection per store root.
    */
  def writeBatched(
      df: DataFrame,
      factory: DocumentStoreFactory,
      collection: String,
      batchSize: Int = 500,
      fieldName: String = "count",
      jobKey: Option[String] = None): (Long, Long) = {
    require(batchSize > 0, s"batchSize must be > 0, got $batchSize")
    val spark = df.sparkSession
    val docsWritten = spark.sparkContext.longAccumulator("docsWritten")
    val batchesCommitted = spark.sparkContext.longAccumulator("batchesCommitted")
    val flushNanos = spark.sparkContext.longAccumulator("flushNanos")
    val rows = df.toDF("docId", "value")
    val key = jobKey.getOrElse(java.util.UUID.randomUUID().toString)
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var flushSeq = 0
        val store = factory.open()
        try {
          it.grouped(batchSize).foreach { group =>
            val docs = group.map { r =>
              r.getString(0) -> Map(fieldName -> r.getLong(1))
            }.toSeq
            val t0 = System.nanoTime()
            store.commitBatchKeyed(
              s"$key/p$pid/f$flushSeq/c${contentKey(docs)}",
              collection, docs)
            flushSeq += 1
            // per-flush latency — the reference logs this in ms per flush
            // (FirestoreUpdateDoFn.java:83,92-93)
            flushNanos.add(System.nanoTime() - t0)
            docsWritten.add(docs.size)
            batchesCommitted.add(1)
          }
        } finally store.close()
      }
    }
    (docsWritten.value, batchesCommitted.value)
  }

  /** Naive sink — one blocking put per element
    * (impl/NaiveImplementation.java:55-60). Even "naive" in Spark amortizes
    * the client per partition: a per-element client (what the reference's
    * naive impl does at :49-53) is the anti-pattern the reference exists to
    * demonstrate, and would be pure overhead here.
    */
  def writeNaive(
      df: DataFrame,
      factory: DocumentStoreFactory,
      collection: String,
      fieldName: String = "count",
      jobKey: Option[String] = None): Long = {
    val docsWritten = df.sparkSession.sparkContext.longAccumulator("docsWritten")
    val key = jobKey.getOrElse(java.util.UUID.randomUUID().toString)
    df.toDF("docId", "value").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var i = 0L
          val store = factory.open()
          // one blocking single-doc commit per element (= the reference's
          // per-element `put`), keyed per element for retry-safe feeds;
          // the content term matters here exactly as in writeBatched —
          // a reordered retry's element e0 holds a DIFFERENT doc, and
          // suppressing it by ordinal alone would lose its feed entry
          try it.foreach { r =>
            val doc = Seq(r.getString(0) -> Map(fieldName -> r.getLong(1)))
            store.commitBatchKeyed(
              s"$key/p$pid/e$i/c${contentKey(doc)}", collection, doc)
            i += 1
            docsWritten.add(1)
          } finally store.close()
        }
    }
    docsWritten.value
  }
}
