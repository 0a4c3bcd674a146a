package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for [[graft.queries.DedupQueries.signaturePairs]]' hot-piece
  * skew guard (SCALE.md "Skew" section, round-13 stretch item).
  *
  * The scenario: a degenerate signature family — every payload identical,
  * e.g. constant planes hashing to sig 0 — makes each of the 4 piece
  * buckets hold the entire family, so the piece self-join's candidate
  * generation for that family is c·(c−1)/2 pairs on ONE reducer per
  * bucket. The guard detects buckets past the threshold and routes them
  * through a salted A×B join (left salts by doc hash, right replicates
  * SaltBuckets ways) — same exact pair set, work spread over SaltBuckets
  * reducers.
  *
  * The skew the guard targets only EXISTS for shuffle joins: under a
  * broadcast piece join the probe side's arbitrary partitioning already
  * spreads the quadratic work (measured: the guard is pure overhead
  * there — 60 s plain vs 105 s guarded at 8k/100k local-broadcast
  * scale), and at 100 TB `pieces` is far past any broadcast threshold.
  * So the A/B forces the shuffle join (autoBroadcastJoinThreshold −1,
  * SkewAB's recipe) — the shape the 1000-executor cluster actually
  * plans — and runs three variants of the SAME query (pair-set
  * equality asserted):
  *   plain   — threshold ∞, AQE off: hot key on one reducer.
  *   aqe     — threshold ∞, AQE skew-join on: the runtime remedy.
  *   guarded — threshold 1000, AQE off: the static salted path.
  *
  * Corpus: `nHot` docs sharing one signature + `nCold` docs with
  * hash-random signatures (the realistic mixed shape: one degenerate
  * family inside a healthy corpus). Output is ~nHot²/2 pairs either way
  * — the OUTPUT is inherently quadratic in the family size; the A/B
  * measures the JOIN's reducer distribution, not output volume.
  *
  * Usage: PieceSkewAB [nHot=20000] [nCold=200000]
  *        PieceSkewAB <sfDir> [nHot=8000]   — sf-volume mode (round-14
  *          stretch): the cold side is the REAL corpus — the mm_phash_dct
  *          signature family over the fixture's text renditions at
  *          `sfDir` (organic piece buckets, organic pair population) —
  *          plus a planted degenerate family of nHot identical
  *          signatures at ids far above the fixture range. Pins the
  *          probe-threshold interaction at scale on real data instead
  *          of hash-random synthetics.
  */
object PieceSkewAB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
    val nHot =
      if (sfDir.isDefined)
        (if (args.length > 1) args(1).toInt else 8000)
      else if (args.length > 0) args(0).toInt else 20000
    val nCold =
      if (sfDir.isDefined) -1 // cold side = the real corpus
      else if (args.length > 1) args(1).toInt
      else 200000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-piece-skew-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hot family: identical signature; cold side: either hash-random
    // synthetics (63-bit, collision buckets stay tiny) or — sf-volume
    // mode — the real mm_phash_dct family over the fixture corpus.
    // Deterministic, no driver state.
    val sigs = sfDir match {
      case Some(dir) =>
        val real = graft.multimodal.Multimodal
          .phashOracleCorpus(spark, dir)
          .filter(octet_length(col("payload")) > 0)
          .select(col("doc_id"),
            graft.functions.PHash64.phash(col("payload")).as("sig"))
        // planted ids start far above every rendition offset family
        val planted = spark.range(nHot.toLong)
          .select((col("id") + 50000000000L).as("doc_id"),
            lit(0x0F0F0F0FL).as("sig"))
        real.unionAll(planted)
      case None =>
        spark.range(nHot.toLong + nCold)
          .select(col("id").as("doc_id"),
            when(col("id") < nHot, lit(0x0F0F0F0FL))
              .otherwise(abs(xxhash64(col("id"))) % lit(Long.MaxValue))
              .as("sig"))
    }

    def run(thr: String, confs: Map[String, String]): (Double, Long) = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.conf.set("graft.signaturePairs.hotPieceThreshold", thr)
      try {
        val t0 = System.nanoTime()
        val n = graft.queries.DedupQueries.signaturePairs(sigs).count()
        ((System.nanoTime() - t0) / 1e9, n)
      } finally {
        spark.conf.unset("graft.signaturePairs.hotPieceThreshold")
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
    }

    // the 100 TB join shape: pieces past any broadcast threshold
    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val plainConf = noBroadcast + ("spark.sql.adaptive.enabled" -> "false")
    val aqeConf = noBroadcast ++ Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scale skew thresholds, same recipe as SkewAB: a skewed
      // partition is >2x median and >16 MB; production keeps defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    // actual cold-side row count for the artifact (advisor round-14: a
    // hardcoded n_cold:-1 in sf-volume mode reads as a count downstream);
    // one count over sigs — the warmup run re-derives the same plan
    val nColdActual =
      if (sfDir.isDefined) sigs.count() - nHot else nCold.toLong

    run("1000", plainConf) // warmup: codegen + checkpoints (not timed)
    val (tGuard, nGuard) = run("1000", plainConf)
    val (tPlain, nPlain) = run(Long.MaxValue.toString, plainConf)
    val (tAqe, nAqe) = run(Long.MaxValue.toString, aqeConf)
    val (tGuard2, nGuard2) = run("1000", plainConf)

    val modeStr = if (sfDir.isDefined) "sf-volume" else "synthetic"
    val dirField = sfDir.map(d => s""""dir":"$d",""").getOrElse("")
    println(
      s"""{"metric":"piece_skew_ab","mode":"$modeStr",$dirField"n_hot":$nHot,"n_cold":$nColdActual,""" +
        s""""plain_sec":${f"$tPlain%.2f"},"aqe_sec":${f"$tAqe%.2f"},""" +
        s""""guarded_sec":${f"$tGuard%.2f"},""" +
        s""""guarded2_sec":${f"$tGuard2%.2f"},""" +
        s""""pairs_plain":$nPlain,"pairs_guarded":$nGuard,""" +
        s""""pairs_agree":${
          nPlain == nGuard && nGuard == nGuard2 && nAqe == nPlain}}""")
    spark.stop()
  }
}
