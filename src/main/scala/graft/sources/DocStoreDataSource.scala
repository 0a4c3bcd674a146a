package graft.sources

import java.io.File
import java.util
import graft.sink.FileDocumentStoreFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the file-backed document store (the
  * zero-egress Firestore stand-in the batched sink writes,
  * graft.sink.FileDocumentStoreFactory).
  *
  * READ: every `<root>/<collection>/<docId>.json` back as rows
  * (collection string, doc_id string, count long).
  * `spark.read.format("graft.sources.DocStoreDataSource")
  *    .option("path", root).load()`
  *
  * WRITE: the same row shape upserted through the [[graft.sink.DocumentStore]]
  * SPI in ≤ maxBatchSize batches per partition —
  * `df.write.format("graft.sources.DocStoreDataSource")
  *    .option("path", root).option("maxBatchSize", "500")
  *    .mode("append").save()`.
  * Append IS upsert here (last-write-wins per doc id, the reference's
  * `DocumentReference.set` semantics) — which is what makes the write path
  * safe under Spark task retries without a commit protocol: a re-run task
  * rewrites identical documents, so `commit`/`abort` need no coordination
  * state. A transactional remote store would hook its two-phase commit into
  * [[DocStoreBatchWrite.commit]].
  *
  * Scale shape: reads parallelize across collection directories; writes
  * parallelize per input partition with one store client each (the Spark
  * analogue of one-client-per-bundle, FirestoreUpdateDoFn.java:37-45).
  */
class DocStoreDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocStoreDataSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocStoreTable(properties.get("path"),
      Option(properties.get("maxBatchSize")).map(_.toInt).getOrElse(500))
}

object DocStoreDataSource {
  val schema: StructType = StructType(Seq(
    StructField("collection", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("count", LongType, nullable = false)))
}

class DocStoreTable(root: String, maxBatchSize: Int = 500)
    extends Table with SupportsRead with SupportsWrite {
  require(root != null, "option 'path' is required")
  override def name(): String = s"docstore($root)"
  override def schema(): StructType = DocStoreDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocStoreScanBuilder(root)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    val expected = DocStoreDataSource.schema.map(f => f.name -> f.dataType)
    val got = in.map(f => f.name -> f.dataType)
    require(got == expected,
      s"docstore write expects schema $expected, got $got")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new DocStoreBatchWrite(root, maxBatchSize)
      }
    }
  }
}

class DocStoreBatchWrite(root: String, maxBatchSize: Int) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    DocStoreWriterFactory(root, maxBatchSize)
  // documents are durably upserted (atomic temp-file rename) as each task
  // batch commits; upsert idempotence makes task-level retry safe without
  // a job-level commit protocol (see class doc)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class DocStoreWriterFactory(root: String, maxBatchSize: Int)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val store = new FileDocumentStoreFactory(root).open()
      private val buf =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]

      private def flush(): Unit = if (buf.nonEmpty) {
        buf.groupBy(_._1).foreach { case (collection, rows) =>
          store.commitBatch(collection,
            rows.toSeq.map { case (_, id, n) => id -> Map("count" -> n) })
        }
        buf.clear()
      }

      override def write(row: InternalRow): Unit = {
        // Reject null keys BEFORE buffering: the schema check upstream
        // compares names/types but not nullability, and commit/abort are
        // deliberately no-ops (upsert idempotence), so an NPE mid-stream
        // would strand earlier durably-upserted batches behind an opaque
        // error. Failing fast with a clear message keeps the task retry
        // path (idempotent re-upsert) the only partial-write story.
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
          throw new IllegalArgumentException(
            "docstore write: collection, doc_id and count must be " +
              s"non-null (partition $partitionId); null rows must be " +
              "filtered before the sink")
        buf += ((row.getString(0), row.getString(1), row.getLong(2)))
        if (buf.size >= maxBatchSize) flush()
      }
      override def commit(): WriterCommitMessage = {
        flush()
        DocStoreWriteCommitted(partitionId)
      }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = store.close()
    }
}

case class DocStoreWriteCommitted(partitionId: Int)
  extends WriterCommitMessage

class DocStoreScanBuilder(root: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = DocStoreDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val collections = Option(new File(root).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.isDirectory).map(_.getName).sorted
    collections.map(c => DocStorePartition(root, c): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreReaderFactory
}

case class DocStorePartition(root: String, collection: String)
  extends InputPartition

class DocStoreReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocStorePartition]
    new PartitionReader[InternalRow] {
      private val docs = new FileDocumentStoreFactory(part.root)
        .readAll(part.collection).toSeq.sortBy(_._1).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (docs.hasNext) {
          val (id, fields) = docs.next()
          current = InternalRow(
            UTF8String.fromString(part.collection),
            UTF8String.fromString(id),
            fields.getOrElse("count", 0L))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
