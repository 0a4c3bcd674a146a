package graft.tools

import graft.functions.VectorFunctions
import graft.queries.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the projection-band near-dup join's pruning
  * power vs cosine threshold (SCALE.md §Dedup; round-9 scale-proofing).
  *
  * `dedup_embedding_lsh` replaces the all-pairs nested loop with an
  * equi-join on floor(w·v / W) where W = √(2−2t): Cauchy–Schwarz puts
  * every pair with cos ≥ t within one band of each other (recall 1.0 by
  * proof). Pruning power is the open question the fixture couldn't
  * answer: candidates/n² depends on W vs the spread of w·v, i.e. on the
  * THRESHOLD and the DATA SHAPE, not the data size. This tool measures,
  * per (threshold, p): band count, candidate pairs, qualifying pairs,
  * and wall seconds for the banded join vs the brute-force baseline on
  * the same corpus, where p is the number of AND-ed orthonormal
  * directions (p=1 is dedup_embedding_lsh; p≥2 is the composite
  * dedup_embedding_lsh_and geometry — one equi-join on the p-tuple cell
  * key with the probe side exploded into its 3ᵖ neighbor cells).
  *
  * The round-9 isotropic finding: on unit-random vectors a single
  * direction's spread (±4σ, σ = 1/√dim) never exceeds W at practical
  * thresholds, so banding prunes NOTHING and AND-ing multiplies f ≈ 1.
  * The clustered mode exists to measure the corpus shape where pruning
  * is real: `gen:n,k,sigma` builds a deterministic mixture of k Gaussian
  * clusters on the unit sphere (centers ~ N(0,1)⁶⁴ normalized; point =
  * normalize(center + sigma·noise), seed 42). There qualifying pairs are
  * cluster-local, each direction separates the centers, and AND-ed
  * pruning compounds ≈ fᵖ.
  *
  * Usage: BandSelectivity <tableDir|gen:n,k,sigma> [t1,t2,...=0.4,0.7,0.9] [p1,p2,...=1]
  * Prints one JSON line per (threshold, p) plus a brute-force baseline.
  */
object BandSelectivity {

  /** Deterministic clustered corpus: (vec_id, u) unit vectors in k
    * Gaussian clusters. Driver-generated (n ≤ ~100k measurement sizes;
    * bounded model-scale data, not a fact table) then parallelized. */
  private def clusteredCorpus(spark: SparkSession, n: Int, k: Int,
                              sigma: Double): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val centers = Array.fill(k)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val pts = (0 until n).map { i =>
      val c = centers(i % k)
      (i.toLong, unit(c.map(_ + sigma * rnd.nextGaussian())).toSeq)
    }
    pts.toDF("vec_id", "u").repartition(32)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: BandSelectivity <tableDir|gen:n,k,sigma> [thresholds] [ps]")
    val dir = args(0)
    val thresholds: Seq[Double] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toDouble)
      else Seq(0.4, 0.7, 0.9)
    val ps: Seq[Int] =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-band-selectivity")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unit = (if (dir.startsWith("gen:")) {
      val Array(n, k, sigma) = dir.stripPrefix("gen:").split(",")
      clusteredCorpus(spark, n.toInt, k.toInt, sigma.toDouble)
    } else
      SimilarityQueries.rawVecs(spark, dir)
        .select(col("vec_id"),
          graft.functions.UnitNormalize.unit(col("v")).as("u"))
    ).localCheckpoint()
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

    for (t <- thresholds; p <- ps) {
      val bandW = math.sqrt(2 - 2 * t)
      val dirs = SimilarityQueries.bandDirs(p)
      val banded = dirs.zipWithIndex.foldLeft(unit) { case (df, (w, i)) =>
        df.withColumn(s"b$i",
          floor(VectorFunctions.dot(col("u"), typedlit(w)) / bandW)
            .cast("long"))
      }.localCheckpoint()
      val nBands = banded
        .select(countDistinct(struct((0 until p).map(i => col(s"b$i")): _*)))
        .head().getLong(0)
      // one equi-join PER neighbor offset tuple with the offset folded
      // into the streamed side's packed key (dedup_embedding_lsh_and's
      // plan shape — measured ~3× faster than one join against a
      // 3^p-way exploded probe table at identical match counts); each
      // pair matches exactly one offset, so the union is
      // duplicate-free. Small packed fields (2^11 per dimension, bands
      // ≤ 1/W + 2 ≪ 2^10) keep p ≤ 5 overflow-safe on a long key.
      def packed(bs: Seq[org.apache.spark.sql.Column]) =
        bs.foldLeft(lit(0L)) { (acc, b) =>
          acc * lit(1L << 11) + (b + lit(1L << 10)) }
      val offsets: Seq[Seq[Int]] =
        (0 until p).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
          acc.flatMap(o => Seq(-1, 0, 1).map(o :+ _))
        }
      val a = banded.select(
        Seq(col("vec_id").as("vec_a"), col("u").as("u_a")) ++
          (0 until p).map(i => col(s"b$i").as(s"a$i")): _*)
      val b = banded.select(col("vec_id").as("vec_b"),
        col("u").as("u_b"),
        packed((0 until p).map(i => col(s"b$i"))).as("cell_b"))
      val t1 = System.nanoTime()
      val res = offsets.map { off =>
          a.join(b, col("cell_b") === packed(
            (0 until p).map(i => col(s"a$i") + off(i))) &&
            col("vec_a") < col("vec_b"))
        }.reduce(_ unionAll _)
        .select(VectorFunctions.dot(col("u_a"), col("u_b")).as("cos"))
        .agg(count(lit(1)).as("cand"),
          sum(when(col("cos") >= t, 1L).otherwise(0L)).as("qual"))
        .head()
      val sec = (System.nanoTime() - t1) / 1e9
      val frac = res.getLong(0).toDouble / math.max(1L, n * (n - 1) / 2)
      println(s"""{"metric":"band_join","t":$t,"p":$p,""" +
        s""""band_width":${f"$bandW%.3f"},""" +
        s""""n_bands":$nBands,"candidates":${res.getLong(0)},""" +
        s""""candidate_frac":${f"$frac%.4f"},"qualifying":${res.getLong(1)},""" +
        s""""sec":${f"$sec%.2f"}}""")
    }
    spark.stop()
  }
}
