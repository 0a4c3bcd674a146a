package graft.sources

import java.io.File
import java.util
import graft.sink.FileDocumentStoreFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 read connector for the file-backed document store (the
  * zero-egress Firestore stand-in the batched sink writes,
  * graft.sink.FileDocumentStoreFactory): reads every
  * `<root>/<collection>/<docId>.json` back as rows
  * (collection string, doc_id string, count long).
  *
  * Usage: `spark.read.format("graft.sources.DocStoreDataSource")
  *           .option("path", root).load()`
  *
  * Scale shape: one input partition per collection directory — reads
  * parallelize across collections, and the reader streams files without
  * materializing the store. (A real remote-store connector would
  * partition by key range; the seam is planInputPartitions.)
  */
class DocStoreDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocStoreDataSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocStoreTable(properties.get("path"))
}

object DocStoreDataSource {
  val schema: StructType = StructType(Seq(
    StructField("collection", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("count", LongType, nullable = false)))
}

class DocStoreTable(root: String) extends Table with SupportsRead {
  require(root != null, "option 'path' is required")
  override def name(): String = s"docstore($root)"
  override def schema(): StructType = DocStoreDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocStoreScanBuilder(root)
}

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
