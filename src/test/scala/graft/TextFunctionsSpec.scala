package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native WordShingles vs the pure-HOF formulation: identical arrays
  * (values AND order) on fixture text and edge cases. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native shingles == HOF shingles on fixture documents") {
    for (n <- Seq(2, 3, 5)) {
      val diff = Tables.documents(spark, sf001)
        .select(
          TextFunctions.shingles(col("text"), n).as("native"),
          TextFunctions.shinglesHof(col("text"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diff == 0L, s"n=$n")
    }
  }

  test("native shingles edge cases match the HOF semantics") {
    val df = Seq(
      "a b c d",        // normal
      "a b",            // shorter than n=3 -> empty
      "a  b   c d",     // runs of spaces collapse
      " a b c ",        // leading/trailing spaces
      "a b a b a b",    // duplicate shingles -> first-occurrence distinct
      "",               // empty text
      "solo")           // single token
      .toDF("text")
    val rows = df.select(
      TextFunctions.shingles(col("text"), 3).as("native"),
      TextFunctions.shinglesHof(col("text"), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (native, hof) => assert(native == hof) }
    // and the documented values for the interesting ones
    assert(rows(0)._1 == Seq("a b c", "b c d"))
    assert(rows(2)._1 == Seq("a b c", "b c d"))
    assert(rows(4)._1 == Seq("a b a", "b a b"))
    assert(rows(5)._1 == Seq.empty)
  }

  test("null text yields empty array (HOF-compatible), not null") {
    val df = Seq(Option.empty[String], Some("x y z")).toDF("text")
    val got = df.select(TextFunctions.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("x y z"))
  }
}
