package graft

import graft.core.WordCount
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based tokenizer parity (SURVEY §5 test plan): for arbitrary
  * generated strings — including unicode letters, digits, punctuation and
  * whitespace runs — the engine's relational tokenizer must equal the
  * reference's Java semantics (`String.split("[^\p{L}]+", -1)` with empty
  * tokens dropped, WordCount.java:45,66-73), and counting invariants must
  * hold. Evaluated in one batch per property for speed.
  */
class TokenizerPropertySpec extends SparkSpec {
  import spark.implicits._

  private val charGen: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaChar,
    2 -> Gen.oneOf('é', 'ü', 'ß', 'ñ', '中', '文', 'λ', 'Ж'),
    2 -> Gen.oneOf(' ', '\t', '.', ',', '!', '-', '_', '0', '9', '\''),
    1 -> Gen.oneOf("  ", " . ", "a1b").flatMap(s => Gen.oneOf(s.toSeq)))
  private val lineGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  /** Reference implementation: exactly the Java pipeline of
    * ExtractWordsFn. */
  private def referenceTokens(line: String): Seq[String] =
    line.split("[^\\p{L}]+", -1).toSeq.filter(_.nonEmpty)

  private def sample(n: Int): Seq[String] = {
    // deterministic scalacheck sampling (fixed seed)
    val params = Gen.Parameters.default
    (0 until n).flatMap(i =>
      lineGen.apply(params, Seed(42L + i)))
  }

  test("property: Spark tokenizer == Java reference on 500 generated lines") {
    val lines = sample(500)
    val got = WordCount.tokenize(lines.toDF("value"))
      .as[String].collect().toSeq.sorted
    val expected = lines.flatMap(referenceTokens).sorted
    assert(got == expected)
  }

  test("property: counts sum to token total and every key is a token") {
    val lines = sample(300)
    val counts = WordCount.countWords(lines.toDF("value"))
      .as[(String, Long)].collect()
    val refToks = lines.flatMap(referenceTokens)
    assert(counts.map(_._2).sum == refToks.length)
    val refSet = refToks.toSet
    assert(counts.forall { case (w, c) => refSet(w) && c > 0 })
    assert(counts.map(_._1).distinct.length == counts.length)
  }

  test("property: native WordShingles == HOF shingles on generated text") {
    // adversarial space placement: multi-space runs, leading/trailing,
    // short docs — the native expression must match the built-ins chain
    // bit-for-bit on arbitrary input, not just the fixture
    val wordGen = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val docGen = for {
      n <- Gen.chooseNum(0, 8)
      ws <- Gen.listOfN(n, wordGen)
      sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "   "))
      lead <- Gen.oneOf("", " ", "  ")
      trail <- Gen.oneOf("", " ")
    } yield lead + (ws, sep).zipped.map(_ + _).mkString + ws.drop(n - 1).headOption.getOrElse("") + trail
    val params = Gen.Parameters.default
    val docs = (0 until 300).flatMap(i => docGen.apply(params, Seed(7L + i)))
    import org.apache.spark.sql.functions.col
    for (n <- Seq(1, 2, 3)) {
      val diff = docs.toDF("text")
        .select(
          graft.functions.TextFunctions.shingles(col("text"), n).as("a"),
          graft.functions.TextFunctions.shinglesHof(col("text"), n).as("b"))
        .filter(col("a") =!= col("b"))
        .count()
      assert(diff == 0L, s"n=$n")
    }
  }

  test("property (pure scalacheck): reference tokens never empty / non-letter") {
    val prop = Prop.forAll(lineGen) { line =>
      referenceTokens(line).forall(t =>
        t.nonEmpty && t.forall(Character.isLetter))
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
