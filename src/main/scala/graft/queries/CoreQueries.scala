package graft.queries

import graft.Tables
import graft.core.WordCount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Word-count parity queries — the reference's full query surface
  * (SURVEY.md §2 O1–O5, O10), run over the `documents` fixture's `text`
  * column (the stand-in for the reference's text-file input).
  *
  * Oracle note: DuckDB regexes are RE2 which also supports `\p{L}`, and the
  * fixture text is plain lowercase ASCII words, so tokenizer parity with
  * `java.util.regex` holds on this corpus (and is additionally pinned by the
  * reference's own golden vectors in the ScalaTest suite).
  */
object CoreQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1+O2+O3+O4: tokenize + count — the flagship.
    "wordcount" -> ((s, d) => WordCount.countWords(docs(s, d), "text")),

    // O5: formatted output "word: n".
    "wordcount_format" -> ((s, d) =>
      WordCount.formatAsText(WordCount.countWords(docs(s, d), "text"))),

    // Top-k words, deterministic tie-break on the word itself.
    "wordcount_topk" -> ((s, d) =>
      WordCount.countWords(docs(s, d), "text")
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(25)),

    // O10 metrics as a relational aggregate (empty-line counter +
    // line-length distribution, WordCount.java:54-63).
    "line_stats" -> ((s, d) => WordCount.lineStats(docs(s, d), "text")))

  val oracles: Map[String, String] = Map(
    "wordcount" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "wordcount_format" ->
      """SELECT word || ': ' || CAST(cnt AS VARCHAR) AS line
        |FROM (SELECT word, COUNT(*) AS cnt
        |      FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |            FROM documents)
        |      WHERE word <> '' GROUP BY word)""".stripMargin,
    "wordcount_topk" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
        |      FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 25""".stripMargin,
    // CASTs: DuckDB SUM(int) returns HUGEINT which pandas reads as float64
    // and the driver then hash-mismatches vs Spark's int64. LENGTH is BIGINT
    // in DuckDB but Spark's length() is INT — cast MIN/MAX down to match.
    "line_stats" ->
      """SELECT CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_lines,
        |       COUNT(*) AS n_lines,
        |       CAST(MIN(LENGTH(text)) AS INTEGER) AS min_len,
        |       CAST(MAX(LENGTH(text)) AS INTEGER) AS max_len,
        |       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
        |FROM documents""".stripMargin)
}
