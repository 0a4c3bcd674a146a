package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Word-count core — the reference's flagship (and only) query, re-expressed
  * relationally so the whole pipeline stays inside whole-stage codegen.
  *
  * Reference semantics (cited into /root/reference/):
  *  - tokenize: split on runs of non-letters, Unicode-aware `[^\p{L}]+`
  *    (src/main/java/org/rm3l/beam/WordCount.java:45), `split(..., -1)` then
  *    drop empty tokens (WordCount.java:66-73);
  *  - count: `Count.perElement()` = group identical words, emit
  *    (word, occurrences) with lifted partial aggregation
  *    (WordCount.java:106) — Catalyst plans the identical partial+final
  *    HashAggregate pair around the shuffle for `groupBy.count`;
  *  - format: `(word, n)` -> `"word: n"` (WordCount.java:80-86).
  *
  * Both Java and Spark compile `\p{L}` through `java.util.regex`, so the
  * tokenizer is semantics-identical by construction.
  */
object WordCount {

  /** WordCount.java:45 — `TOKENIZER_PATTERN`. */
  val TokenizerPattern = "[^\\p{L}]+"

  /** Tokenize a text column into one row per non-empty token.
    * Relational form of ExtractWordsFn (WordCount.java:52-75): the metric
    * side-effects (empty-line counter, line-length distro) are handled
    * separately via [[lineStats]] so the hot path stays pure + codegen'd.
    */
  def tokenize(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .select(explode(split(col(textCol), TokenizerPattern, -1)).as("word"))
      .filter(length(col("word")) > 0)

  /** CountWords composite (WordCount.java:96-110): tokenize then count per
    * word. Output schema: (word string, cnt bigint).
    */
  def countWords(lines: DataFrame, textCol: String = "value"): DataFrame =
    tokenize(lines, textCol).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** FormatAsTextFn (WordCount.java:80-86): `(word, n)` -> `"word: n"`. */
  def formatAsText(counts: DataFrame): DataFrame =
    counts.select(
      concat(col("word"), lit(": "), col("cnt").cast("string")).as("line"))

  /** The reference's O10 metrics (WordCount.java:54-63): `emptyLines`
    * counter and `lineLenDistro` distribution — computed as one aggregate
    * pass (Spark's `Observation`/accumulator analogue, but expressed
    * relationally so it is also oracle-checkable).
    * A line is "empty" when `trim(line).isEmpty` (WordCount.java:61).
    */
  def lineStats(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines.agg(lineStatsExprs(textCol).head, lineStatsExprs(textCol).tail: _*)

  private def lineStatsExprs(textCol: String): Seq[Column] = Seq(
    sum(when(length(trim(col(textCol))) === 0, 1L).otherwise(0L))
      .as("empty_lines"),
    count(lit(1)).as("n_lines"),
    min(length(col(textCol))).as("min_len"),
    max(length(col(textCol))).as("max_len"),
    sum(length(col(textCol))).as("sum_len"))

  /** O10 the way the reference wires it: metrics observed ON the flowing
    * pipeline (Beam `Metrics.counter`/`distribution` updated inside
    * ExtractWordsFn, WordCount.java:54-63) rather than a second pass.
    * Spark's `Observation` collects the same counter + distribution
    * values as a side effect of whatever action runs downstream.
    */
  def countWordsObserved(
      lines: DataFrame,
      textCol: String,
      obs: org.apache.spark.sql.Observation): DataFrame = {
    val observed = lines.observe(obs, lineStatsExprs(textCol).head,
      lineStatsExprs(textCol).tail: _*)
    countWords(observed, textCol)
  }

}
