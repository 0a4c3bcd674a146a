package graft.sink

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Target-agnostic keyed-document store SPI.
  *
  * Mirrors the reference's `InputToDocumentRefUpdater<T>` contract
  * (/root/reference/src/main/java/org/rm3l/beam/firestore/FirestoreUpdateDoFn.java:97-101):
  * the sink is deliberately generic over the element type and the backing
  * store. In the reference the store is Google Cloud Firestore; in this
  * zero-egress environment the provided implementations are local, but the
  * sink operators ([[DocSink]]) only ever talk to this trait, so a real
  * remote store plugs in unchanged.
  *
  * Semantics pinned by the reference:
  *  - `put` is a keyed upsert (`DocumentReference.set`, last-write-wins —
  *    impl/NaiveImplementation.java:55-60) => idempotent, safe under Spark
  *    task retries (at-least-once delivery converges to effectively-once
  *    state).
  *  - `commitBatch` commits a buffered group of ≤ maxBatchSize puts
  *    atomically (the *intended* semantics of FirestoreUpdateDoFn.java:78-95;
  *    see SURVEY.md §2.1 fidelity note).
  */
trait DocumentStore extends AutoCloseable {
  /** Atomically upsert a batch of (docId -> fields) documents. */
  def commitBatch(collection: String, docs: Seq[(String, Map[String, Long])]): Unit
  /** Single-document blocking upsert (the naive path,
    * impl/NaiveImplementation.java:55-60). */
  def put(collection: String, docId: String, fields: Map[String, Long]): Unit =
    commitBatch(collection, Seq(docId -> fields))
  def close(): Unit = ()
}

/** Serializable factory — one store client is opened per partition (the
  * Spark analogue of Beam's one-client-per-bundle, FirestoreUpdateDoFn.java:37-45)
  * so only the factory closure crosses the driver→executor boundary, exactly
  * like the reference's serializable updater (FirestoreUpdateDoFn.java:98).
  */
trait DocumentStoreFactory extends Serializable {
  def open(): DocumentStore
}

/** In-memory store for tests. JVM-local (works in local[*] where executors
  * share the driver JVM). Thread-safe: concurrently-running partitions all
  * write to the shared map; batch atomicity is per-batch synchronized.
  */
object InMemoryDocumentStore {
  private val stores =
    new ConcurrentHashMap[String, TrieMap[(String, String), Map[String, Long]]]()

  def storeFor(name: String): TrieMap[(String, String), Map[String, Long]] =
    stores.computeIfAbsent(name, _ => TrieMap.empty)

  def clear(name: String): Unit = stores.remove(name)

  /** Count of commitBatch calls per store — lets tests assert flush cadence
    * (⌈N/B⌉ batches for N elements, FirestoreUpdateDoFn.java:53-55,61). */
  private val commits = new ConcurrentHashMap[String, java.lang.Long]()
  def commitCount(name: String): Long =
    Option(commits.get(name)).map(_.longValue()).getOrElse(0L)

  def factory(name: String): DocumentStoreFactory = new DocumentStoreFactory {
    def open(): DocumentStore = new DocumentStore {
      private val m = storeFor(name)
      def commitBatch(collection: String,
                      docs: Seq[(String, Map[String, Long])]): Unit = {
        docs.foreach { case (id, fields) => m.put((collection, id), fields) }
        commits.merge(name, 1L, (a, b) => a + b)
      }
    }
  }
}

/** Filesystem-backed store: one small JSON file per document at
  * `root/collection/docId.json`, written atomically via temp-file rename.
  * Upsert = overwrite => idempotent under retries. This is the zero-egress
  * stand-in for the Firestore collection the reference writes
  * (impl/BatchWriteImplementation.java:45-50).
  */
class FileDocumentStoreFactory(root: String) extends DocumentStoreFactory {
  def open(): DocumentStore = new DocumentStore {
    def commitBatch(collection: String,
                    docs: Seq[(String, Map[String, Long])]): Unit = {
      val dir = Paths.get(root, collection)
      Files.createDirectories(dir)
      docs.foreach { case (id, fields) =>
        // doc ids are words ([\p{L}]+ only) => safe as file names
        val json = fields.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
        val tmp = Files.createTempFile(dir, s".$id", ".tmp")
        Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, dir.resolve(s"$id.json"),
          StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
      // publish the batch to the store's change feed AFTER the docs are
      // durable — a feed entry always refers to readable state (the
      // Firestore-watch analogue; see DocStoreChangelog)
      DocStoreChangelog.append(root, collection, docs)
    }
  }

  def readAll(collection: String): Map[String, Map[String, Long]] = {
    val dir = new File(root, collection)
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".json"))
      .map { f =>
        val id = f.getName.stripSuffix(".json")
        val body = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        val fields = body.stripPrefix("{").stripSuffix("}").split(",")
          .filter(_.trim.nonEmpty)
          .map { kv =>
            val Array(k, v) = kv.split(":").map(_.trim)
            k.stripPrefix("\"").stripSuffix("\"") -> v.toLong
          }.toMap
        id -> fields
      }.toMap
  }
}
