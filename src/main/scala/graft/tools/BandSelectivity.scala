package graft.tools

import graft.functions.VectorFunctions
import graft.queries.SimilarityQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the projection-band near-dup join's pruning
  * power vs cosine threshold (SCALE.md §Dedup; round-9 scale-proofing).
  *
  * `dedup_embedding_lsh` replaces the all-pairs nested loop with an
  * equi-join on floor(w·v / W) where W = √(2−2t): Cauchy–Schwarz puts
  * every pair with cos ≥ t within one band of each other (recall 1.0 by
  * proof). Pruning power is the open question the fixture couldn't
  * answer: candidates/n² depends on W vs the spread of w·v, i.e. on the
  * THRESHOLD, not the data size. This tool measures, per threshold:
  * band count, candidate pairs, qualifying pairs, and wall seconds for
  * the banded join vs the brute-force baseline on the same corpus.
  *
  * Usage: BandSelectivity <tableDir> [t1,t2,...=0.4,0.7,0.9]
  * Prints one JSON line per threshold plus a brute-force baseline line.
  */
object BandSelectivity {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandSelectivity <tableDir> [thresholds]")
    val dir = args(0)
    val thresholds: Seq[Double] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toDouble)
      else Seq(0.4, 0.7, 0.9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-band-selectivity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unit = SimilarityQueries.rawVecs(spark, dir)
      .select(col("vec_id"),
        graft.functions.UnitNormalize.unit(col("v")).as("u"))
      .localCheckpoint()
    val n = unit.count()

    // brute-force baseline: all n²/2 pairs, count qualifying at the
    // LOOSEST threshold (one pass; per-threshold counts by filter)
    val a = unit.toDF("vec_a", "u_a")
    val b = unit.toDF("vec_b", "u_b")
    val t0 = System.nanoTime()
    val bruteCounts = a.join(b, col("vec_a") < col("vec_b"))
      .select(VectorFunctions.dot(col("u_a"), col("u_b")).as("cos"))
      .agg(count(lit(1)).as("pairs"),
        thresholds.map(t =>
          sum(when(col("cos") >= t, 1L).otherwise(0L)).as(s"q$t")): _*)
      .head()
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"band_brute","n":$n,""" +
      s""""pairs":${bruteCounts.getLong(0)},""" +
      thresholds.zipWithIndex.map { case (t, i) =>
        s""""qualifying_t$t":${bruteCounts.getLong(i + 1)}"""
      }.mkString(",") +
      s""","sec":${f"$bruteSec%.2f"}}""")

    thresholds.foreach { t =>
      val bandW = math.sqrt(2 - 2 * t)
      val w = SimilarityQueries.bandW0
      val banded = unit.withColumn("band",
        floor(VectorFunctions.dot(col("u"), typedlit(w)) / bandW)
          .cast("long")).localCheckpoint()
      val nBands = banded.select(countDistinct(col("band"))).head().getLong(0)
      val ba = banded.toDF("vec_a", "u_a", "band_a")
      val bb = banded.toDF("vec_b", "u_b", "band_b")
      val t1 = System.nanoTime()
      val cand = Seq(-1, 0, 1).map { off =>
          ba.join(bb, col("band_b") === col("band_a") + off &&
            col("vec_a") < col("vec_b"))
        }.reduce(_ unionAll _)
      val res = cand
        .select(VectorFunctions.dot(col("u_a"), col("u_b")).as("cos"))
        .agg(count(lit(1)).as("cand"),
          sum(when(col("cos") >= t, 1L).otherwise(0L)).as("qual"))
        .head()
      val sec = (System.nanoTime() - t1) / 1e9
      val frac = res.getLong(0).toDouble / math.max(1L, n * (n - 1) / 2)
      println(s"""{"metric":"band_join","t":$t,"band_width":${f"$bandW%.3f"},""" +
        s""""n_bands":$nBands,"candidates":${res.getLong(0)},""" +
        s""""candidate_frac":${f"$frac%.4f"},"qualifying":${res.getLong(1)},""" +
        s""""sec":${f"$sec%.2f"}}""")
    }
    spark.stop()
  }
}
