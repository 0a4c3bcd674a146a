package graft

import graft.core.{Options, WordCount}
import graft.sink.{DocSink, FileDocumentStoreFactory, InMemoryDocumentStore}
import java.nio.file.Files

/** Sink behavior vectors from FIXTURES.md §A.3 (derived from the reference's
  * FirestoreUpdateDoFn.java — no sink test exists in the reference itself):
  * batching cadence, document shape, idempotence under replay.
  */
class DocSinkSpec extends SparkSpec {
  import spark.implicits._

  private def countsDf(n: Int) =
    (1 to n).map(i => (s"word$i", i.toLong)).toDF("docId", "value")

  test("batched sink: flush cadence is ceil(N/B) per partition") {
    val name = "cadence"
    InMemoryDocumentStore.clear(name)
    // single partition of 12 elements, batch size 5 -> 3 commits
    val df = countsDf(12).coalesce(1)
    val (written, batches) =
      DocSink.writeBatched(df, InMemoryDocumentStore.factory(name), "c", 5)
    assert(written == 12L)
    assert(batches == 3L) // ceil(12/5) — FirestoreUpdateDoFn.java:53-55,61
    assert(InMemoryDocumentStore.storeFor(name).size == 12)
  }

  test("batched sink: document shape is {count: n} keyed by word") {
    val name = "shape"
    InMemoryDocumentStore.clear(name)
    val df = Seq(("hi", 5L), ("sue", 2L)).toDF("docId", "value")
    DocSink.writeBatched(df, InMemoryDocumentStore.factory(name), "kinglear", 500)
    val m = InMemoryDocumentStore.storeFor(name)
    assert(m(("kinglear", "hi")) == Map("count" -> 5L))
    assert(m(("kinglear", "sue")) == Map("count" -> 2L))
  }

  test("batched sink: idempotent under replay (keyed upsert)") {
    val name = "replay"
    InMemoryDocumentStore.clear(name)
    val df = countsDf(50)
    DocSink.writeBatched(df, InMemoryDocumentStore.factory(name), "c", 7)
    val first = InMemoryDocumentStore.storeFor(name).toMap
    DocSink.writeBatched(df, InMemoryDocumentStore.factory(name), "c", 7)
    assert(InMemoryDocumentStore.storeFor(name).toMap == first)
  }

  test("naive sink writes the same state as batched") {
    val (n1, n2) = ("naive1", "batch1")
    InMemoryDocumentStore.clear(n1); InMemoryDocumentStore.clear(n2)
    val df = countsDf(20)
    DocSink.writeNaive(df, InMemoryDocumentStore.factory(n1), "c")
    DocSink.writeBatched(df, InMemoryDocumentStore.factory(n2), "c", 6)
    assert(InMemoryDocumentStore.storeFor(n1).toMap ==
      InMemoryDocumentStore.storeFor(n2).toMap)
  }

  test("file store: atomic upsert files, readable back") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val f = new FileDocumentStoreFactory(dir)
    val df = Seq(("alpha", 3L), ("beta", 9L)).toDF("docId", "value")
    DocSink.writeBatched(df, f, "col1", 500)
    assert(f.readAll("col1") ==
      Map("alpha" -> Map("count" -> 3L), "beta" -> Map("count" -> 9L)))
    // replay converges (overwrite)
    DocSink.writeBatched(df, f, "col1", 1)
    assert(f.readAll("col1").size == 2)
  }

  test("end-to-end CLI parity: wordcount text file -> file store") {
    val in = Files.createTempFile("kinglear", ".txt")
    Files.write(in, "hi there\nhi\nhi sue bob\nhi sue\n\nbob hi\n".getBytes)
    val out = Files.createTempDirectory("graft-cli").toString
    val o = Options(implementation = "batch", inputFile = in.toString,
      outputDir = out, maxBatchSize = 2)
    val counts = WordCount.countWords(spark.read.textFile(o.inputFile).toDF("value"))
    DocSink.writeBatched(counts, new FileDocumentStoreFactory(o.outputDir),
      o.collection, o.maxBatchSize)
    val f = new FileDocumentStoreFactory(out)
    // collection defaults to input basename (impl/NaiveImplementation.java:31-34)
    val docs = f.readAll(o.collection)
    assert(docs == Map(
      "hi" -> Map("count" -> 5L), "there" -> Map("count" -> 1L),
      "sue" -> Map("count" -> 2L), "bob" -> Map("count" -> 2L)))
  }

  test("options parsing matches the reference's defaults and validation") {
    val o = Options.parse(Array("--inputFile=/tmp/x/kinglear.txt", "--outputDir=/tmp/o"))
    assert(o.implementation == "naive") // WordCountToFirestorePipeline.java:63
    assert(o.maxBatchSize == 500)       // FirestoreUpdateDoFn.java:19
    assert(o.collection == "kinglear.txt")
    intercept[IllegalArgumentException] {
      Options.parse(Array("--outputDir=/tmp/o")) // inputFile required
    }
    intercept[IllegalArgumentException] {
      Options.parse(Array("--inputFile=a", "--outputDir=b", "--bogus=1"))
    }
  }
}
