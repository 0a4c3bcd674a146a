package graft.tools

import graft.queries.DedupQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness: direct containment (`dedup_containment`) vs the
  * prefix-filtered twin (`dedup_containment_prefix`) under hot-shingle
  * skew — the asymmetric case the prefix rule exists for (SCALE.md
  * "Dedup family"; the jaccard analogue's break-even is in BENCH.md).
  *
  * On the corpus fixtures both implementations verify over nearly the
  * same pair volume (small hot vocabulary ⇒ everything co-occurs ⇒
  * candidate-doc pruning saves little) and the twin's extra rank pass
  * makes it ~1.4× slower at sf0.1 and only ~1.1× faster at sf1. The
  * scenario that separates them is BOILERPLATE: a shared block (site
  * chrome, license header, template) appearing in a large fraction p of
  * documents. Every boilerplate shingle then has df ≈ p·N, and the
  * direct method's co-occurrence join materializes Σ df² ≈ (p·N)²
  * rows per hot shingle — the f² blowup — while the prefix rule sorts
  * hot shingles LAST in every doc's rarity order, so they enter no
  * doc's probe prefix and the candidate join stays near-linear.
  *
  * The generator plants disjoint random text per doc (a large vocab, so
  * baseline co-occurrence is sparse) plus the boilerplate block in p of
  * docs, and ALSO plants real contained pairs (excerpt docs whose text
  * is a slice of a container doc) so agreement is checked on non-empty
  * output. Deterministic: xxhash64-derived words, no RNG state.
  *
  * Prints one JSON line per p with both wall times and output equality.
  *
  * Usage: ContainmentAB [nDocs=30000] [wordsPerDoc=40]
  */
object ContainmentAB {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    val wpd = if (args.length > 1) args(1).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-containment-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (0 until 12).map(i => s"boiler$i").mkString(" ")

    for (pPct <- Seq(0, 30, 60)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-contain-ab-$pPct").toString
      // random body: wpd words drawn from a 50k vocab by doc-and-position
      // hash — cross-doc shingle collisions are rare, so co-occurrence
      // is driven by the planted structure, not noise
      val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          // every 10th doc is an EXCERPT: its body is a deterministic
          // slice of the previous doc's body (true containment ≥ 0.9
          // after the slice keeps ≥ 90% of shingles) — agreement must
          // hold on real positives, not just empty outputs
          transform(sequence(lit(0), lit(wpd - 1)), i =>
            concat(lit("w"), pmod(xxhash64(
              when(pmod(col("id"), lit(10)) === 9, col("id") - 1)
                .otherwise(col("id")), i), lit(50000L)))),
          when(pmod(xxhash64(col("id"), lit(7)), lit(100)) < pPct,
            lit(boiler)).otherwise(lit(""))).as("text"))
        // the excerpt keeps the full body minus the tail word: shingle
        // containment in the original is (wpd-3)/(wpd-2) ≥ 0.97
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 9,
            regexp_replace(col("text"), " \\S+$", ""))
            .otherwise(col("text")))
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

      def run(name: String): (Double, Set[(Long, Long, Long)]) = {
        import spark.implicits._
        val t0 = System.nanoTime()
        val out = DedupQueries.queries(name)(spark, dir)
          .as[(Long, Long, Long)].collect().toSet
        ((System.nanoTime() - t0) / 1e9, out)
      }
      run("dedup_containment") // warm page cache + codegen once per p
      val (tDirect, outDirect) = run("dedup_containment")
      val (tPrefix, outPrefix) = run("dedup_containment_prefix")
      println(s"""{"p_boiler_pct":$pPct,"n_docs":$n,""" +
        s""""direct_sec":$tDirect,"prefix_sec":$tPrefix,""" +
        s""""pairs":${outDirect.size},"equal":${outDirect == outPrefix}}""")
      // drop this p-value's checkpoint blocks before the next (the
      // Bench harness's per-query isolation lesson)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
