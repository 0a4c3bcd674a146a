package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a hash shuffle on a fingerprint, never on raw text;
  *  - n-gram Jaccard finds candidates by *inverted-index self-join on
  *    shingles* (exact superset of every pair with jaccard > 0), then
  *    verifies with exact set arithmetic — no O(n²) cross join anywhere;
  *  - MinHash/LSH replaces the shingle join with a banded-signature join
  *    (constant 8 keys per doc instead of |shingles|), the scalable path
  *    when common shingles would explode the inverted index;
  *  - SimHash pairs via 4×16-bit piece blocking (pigeonhole: hamming ≤ 3
  *    ⇒ at least one exact 16-bit piece match);
  *  - embedding near-dup is brute-force here (oracle-checkable) with the
  *    LSH-bucketed variant in SimilarityQueries as the scale path.
  */
object DedupQueries {

  private val JaccardThreshold = 0.8

  /** (doc_id, shingle) inverted index — distinct 3-gram shingles.
    * Repartition first: the documents parquet is a single file (one
    * partition); spreading rows lets the shingle computation and the
    * downstream self-join use all cores. */
  private def shingleIndex(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))

  /** Exact-jaccard pairs over a candidate-pair DataFrame (doc_a, doc_b)
    * given the shingle index: |A∩B| via co-occurrence count, sizes joined
    * in, jaccard = inter/(|A|+|B|-inter). */
  private def exactJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingleIndex(s, d)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("doc_a", "s")
    val b = sh.toDF("doc_b", "s")
    val inter = a.join(b, "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: canonical = min doc_id among identical texts. Shuffles
    // on an md5 fingerprint (16 bytes), not the full text — at 100 TB the
    // shuffle payload is keys, not documents.
    "dedup_exact" -> ((s, d) => {
      val w = Window.partitionBy(md5(col("text").cast("binary")))
      Tables.documents(s, d)
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") =!= col("canonical_id")).as("is_dup"))
    }),

    // N-gram Jaccard near-dup: inverted-index candidates + exact verify.
    "dedup_ngram_jaccard" -> ((s, d) =>
      exactJaccardPairs(s, d)
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6)
          .as("jaccard"))),

    // MinHash(64) + LSH(8 bands × 8 rows) candidates, then exact-jaccard
    // verification of candidates only. Probabilistic recall (>0.99 at
    // j≥0.9); pinned against dedup_ngram_jaccard in DedupSpec.
    // The repartition is load-bearing twice over: it spreads the
    // signature computation across cores (the parquet is one file = one
    // partition) AND it is the exchange barrier that keeps the shingle
    // array an attribute — see the eval-once warning on minHashBands.
    "dedup_minhash_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), minHashBands(col("sh"), 8, 8).as("bands"))
      val exploded = docs.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      val cand = exploded.toDF("doc_a", "band_idx", "band_hash")
        .join(exploded.toDF("doc_b", "band_idx", "band_hash"),
          Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      cand.join(exactJaccardPairs(s, d), Seq("doc_a", "doc_b"))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6)
          .as("jaccard"))
    }),

    // SimHash near-dup: 64-bit signatures, blocked by 16-bit pieces
    // (hamming ≤ 3 guarantees ≥1 identical piece), verified by bit_count.
    "dedup_simhash" -> ((s, d) => {
      // repartition = parallelism + eval-once barrier (the piece-explode
      // below would otherwise inline and recompute the signature 4×/row)
      val sigs = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), simHash(tokens(col("text"))).as("sig"))
        .repartition(col("doc_id"))
      val pieces = sigs.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)), p =>
          call_function("shiftright", col("sig"), (p * 16).cast("int"))
            .bitwiseAND(lit(0xFFFFL))))
          .as(Seq("piece_idx", "piece")))
      pieces.toDF("doc_a", "sig_a", "piece_idx", "piece")
        .join(pieces.toDF("doc_b", "sig_b", "piece_idx", "piece"),
          Seq("piece_idx", "piece"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    }),

    // Embedding near-dup: all pairs with cosine ≥ 0.4 (fixture has no
    // tighter clusters). Brute force n²/2 — oracle-checkable baseline; the
    // LSH-bucketed variant (sim_ann_lsh) is the scale path.
    "dedup_embedding" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // left side repartitioned: the broadcast-NL join's parallelism is
      // the stream side's partition count (the parquet is one file)
      val a = e.toDF("vec_a", "emb_a").repartition(col("vec_a"))
      val b = e.toDF("vec_b", "emb_b")
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          VectorFunctions.cosine(col("emb_a"), col("emb_b")).as("cos"))
        .filter(col("cos") >= 0.4)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
    }))

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 3 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-2),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |    ELSE [] END AS shingles
        |  FROM docs),
        |idx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM idx GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM idx a JOIN idx b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  ROUND(list_dot_product(a.v, b.v) /
        |        sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)),
        |        6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |      sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
        |      >= 0.4""".stripMargin)
}
