package graft

import graft.core.WordCount
import org.apache.spark.sql.Dataset

/** SURVEY §1.3: the engine prefers Dataset[T] where compile-time schemas
  * help (mirroring the reference's generics-carried schemas). This spec
  * pins that the typed surface produces identical results to the
  * relational one. */
/** Top-level so Spark can instantiate it without an outer-class scope. */
final case class Doc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset word count equals relational word count") {
    val docs: Dataset[Doc] = Tables.documents(spark, sf0001).as[Doc]
    val typed: Map[String, Long] = docs
      .flatMap(d => d.text.split("[^\\p{L}]+", -1).filter(_.nonEmpty))
      .groupByKey(identity)
      .count()
      .collect().toMap
    val relational = WordCount
      .countWords(Tables.documents(spark, sf0001), "text")
      .as[(String, Long)].collect().toMap
    assert(typed == relational)
  }

  test("typed filter+map pipeline with case-class schema") {
    val docs = Tables.documents(spark, sf0001).as[Doc]
    val long = docs.filter(_.n_chars > 400).map(d => (d.doc_id, d.lang))
    val viaDf = Tables.documents(spark, sf0001)
      .filter($"n_chars" > 400).select($"doc_id", $"lang")
      .as[(Long, String)]
    assert(long.collect().toSet == viaDf.collect().toSet)
  }
}
