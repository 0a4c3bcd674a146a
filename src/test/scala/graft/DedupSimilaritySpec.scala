package graft

import graft.queries.{DedupQueries, SimilarityQueries}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Pins the probabilistic/hash-based operators that the DuckDB oracle
  * can't express: MinHash-LSH recall vs the exact Jaccard method, SimHash
  * behavior on near-dups, ANN recall vs brute force, fingerprints.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(name: String) =
    DedupQueries.queries(name)(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("minhash-lsh candidates find every exact-jaccard near-dup pair") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty) // fixture plants ~25 near-dup pairs
    // LSH output is verified against exact jaccard, so it can only be a
    // subset; on this fixture (j≈0.9+) recall is 100% — pin it.
    assert(lsh == exact, s"missed=${exact.diff(lsh)} extra=${lsh.diff(exact)}")
  }

  test("simhash pairs (hamming<=3) are true bag-of-words near-dups") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = pairs("dedup_simhash")
    assert(sim.nonEmpty)
    assert(sim.size >= exact.size / 2, s"recall too low: ${sim.size}/${exact.size}")
    // SimHash measures unordered token-set similarity (unigrams), not the
    // order-sensitive 3-gram shingle jaccard — so instead of subset-of-
    // shingle-dups, assert every flagged pair really has high token-set
    // jaccard (catches pairs shingling misses, e.g. reordered docs).
    val toks = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    sim.foreach { case (a, b) =>
      val (wa, wb) = (toks(a).toSet, toks(b).toSet)
      val jac = wa.intersect(wb).size.toDouble / wa.union(wb).size
      assert(jac >= 0.7, s"pair ($a,$b) token-jaccard=$jac")
    }
  }

  test("ann lsh top-10 recall vs brute force is usable") {
    val brute = SimilarityQueries.queries("sim_topk_bruteforce")(spark, sf001)
      .select("vec_id").as[Long].collect().toSet
    val ann = SimilarityQueries.queries("sim_ann_lsh")(spark, sf001)
      .select("vec_id").as[Long].collect().toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall") // 6-bit buckets, radius-2
    // probe on a diffuse random corpus — pinned floor; clustered
    // real-world data recalls far higher
  }

  test("banded-projection embedding dedup equals brute force exactly") {
    // not a recall pin — band containment is PROVEN (|w·a − w·b| ≤ ‖a−b‖
    // ≤ √(2−2t) for unit vectors), so the two queries must be identical
    // row-for-row including the cosine values
    def rows(name: String) =
      DedupQueries.queries(name)(spark, sf001)
        .select("vec_a", "vec_b", "cos")
        .as[(Long, Long, Double)].collect().toSet
    val brute = rows("dedup_embedding")
    val banded = rows("dedup_embedding_lsh")
    assert(brute.nonEmpty)
    assert(banded == brute,
      s"missed=${brute.diff(banded)} extra=${banded.diff(brute)}")
    // the composite AND-band variant applies the same proof per
    // direction, so it too must be identical — including cosines
    val and2 = rows("dedup_embedding_lsh_and")
    assert(and2 == brute,
      s"missed=${brute.diff(and2)} extra=${and2.diff(brute)}")
  }

  test("composite AND-band join is exact on a clustered corpus too") {
    // the pruning case the fixture can't exercise: tight clusters, where
    // AND-ed bands drop cross-cluster pairs. Recall must still be 1.0 —
    // verify the one-join-exploded-probe geometry against brute force on
    // deterministic clustered points (mixture of 4 sphere clusters)
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // geometry that PRUNES: band width W = √(2−2t) must undercut the
    // projection spread of pair differences (σ·√2 ≈ 0.177 at dim 64), so
    // t = 0.99 (W ≈ 0.141); clusters tight enough (σ_within = 0.01 →
    // within-cluster cos ≈ 0.994) that qualifying pairs exist at that t
    val centers = Array.fill(12)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val pts = (0L until 120L).map { i =>
      i -> unit(centers((i % 12).toInt).map(_ + 0.01 * rnd.nextGaussian()))
    }
    val t = 0.99
    val brutePairs = (for {
      (ia, va) <- pts; (ib, vb) <- pts if ia < ib
      c = va.lazyZip(vb).map(_ * _).sum if c >= t
    } yield (ia, ib)).toSet
    assert(brutePairs.nonEmpty, "clustered fixture produced no pairs")
    val bandW = math.sqrt(2 - 2 * t)
    val dirs = SimilarityQueries.bandDirs(2)
    def cellOf(v: Array[Double]) = dirs.map(w =>
      math.floor(w.lazyZip(v).map(_ * _).sum / bandW).toLong)
    val cells = pts.map { case (i, v) => i -> cellOf(v) }.toMap
    val bandedPairs = (for {
      (ia, _) <- pts; (ib, _) <- pts if ia < ib
      ca = cells(ia); cb = cells(ib)
      if ca.lazyZip(cb).forall((x, y) => math.abs(x - y) <= 1)
      c = pts(ia.toInt)._2.lazyZip(pts(ib.toInt)._2).map(_ * _).sum
      if c >= t
    } yield (ia, ib)).toSet
    assert(bandedPairs == brutePairs,
      s"missed=${brutePairs.diff(bandedPairs)}")
    // and the AND actually prunes here: candidate cells differ across
    // clusters, so the ≤1-apart candidate set is a strict subset of all
    // pairs (this is the claim SCALE.md measures at scale)
    val candCount = (for {
      (ia, _) <- pts; (ib, _) <- pts if ia < ib
      ca = cells(ia); cb = cells(ib)
      if ca.lazyZip(cb).forall((x, y) => math.abs(x - y) <= 1)
    } yield 1).size
    val allPairs = pts.size * (pts.size - 1) / 2
    assert(candCount < allPairs,
      s"AND-band pruned nothing on clustered data ($candCount/$allPairs)")
  }

  test("dedup clusters: transitive closure of pairs, canonical = min id") {
    val pairList = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = DedupQueries.queries("dedup_clusters")(spark, sf001)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // every pair ends up in the same cluster (transitivity is what the
    // component step adds over raw pairs)
    pairList.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split")
    }
    // the canonical id is the minimum member of its cluster
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid min=${members.keys.min}")
    }
    // docs in no pair are their own singleton cluster
    val inPairs = pairList.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot { case (id, _) => inPairs(id) }
      .foreach { case (id, cid) => assert(id == cid) }
  }

  test("dedup_canonical: one survivor per cluster — longest member, min id on ties") {
    val rows = DedupQueries.queries("dedup_canonical")(spark, sf001)
      .select("doc_id", "cluster_id", "n_tokens", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    // cluster partition agrees with dedup_clusters exactly
    val clusters = DedupQueries.queries("dedup_clusters")(spark, sf001)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cid, _, _) => assert(clusters(id) == cid) }
    // exactly one keeper per cluster: the longest member, min id on ties
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $cid keepers=${keepers.length}")
      val best = members.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == best._1,
        s"cluster $cid kept ${keepers.head} not $best")
    }
    // the fixture's planted near-dup clusters are non-trivial: some
    // cluster must actually choose among >1 member
    assert(byCluster.exists(_._2.length > 1))
  }

  test("prefix-filtered jaccard equals the naive inverted-index path") {
    // prefix filtering is provably exact for j >= t (see
    // prefixJaccardPairs doc) — results must match row-for-row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6))
        .as[(Long, Long, Double)].collect().toSet
    val naive = rows(DedupQueries.exactJaccardPairs(spark, sf001)
      .filter(col("jaccard") >= 0.8))
    val prefix = rows(DedupQueries.prefixJaccardPairs(spark, sf001))
    assert(naive.nonEmpty)
    assert(prefix == naive,
      s"missed=${naive.diff(prefix)} extra=${prefix.diff(naive)}")
  }

  test("df>=2 singleton pruning preserves exact jaccard pairs") {
    val sh = DedupQueries.shingleIndex(spark, sf001)
    def result(prune: Boolean) =
      DedupQueries.exactJaccardOn(sh, pruneSingletons = prune)
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6))
        .as[(String, String, Double)].collect().toSet
    val off = result(false)
    val on = result(true)
    assert(off.nonEmpty)
    assert(on == off, s"missed=${off.diff(on)} extra=${on.diff(off)}")
  }

  test("singleton-pruning heuristic: on for sparse vocab, off for hot vocab") {
    // realistic web corpus: most shingles unique -> prune
    assert(DedupQueries.shouldPruneSingletons(900L, 1000L))
    // hot-vocab corpus (the sf0.1 fixture's shape, distinct/total ≈ 0.10,
    // where pruning measured net-negative) -> don't
    assert(!DedupQueries.shouldPruneSingletons(50L, 1000L))
    assert(!DedupQueries.shouldPruneSingletons(0L, 0L))
    // one-pass stats helper end-to-end: the sf0.001 corpus is small enough
    // that most shingles ARE singletons (ratio ≈ 0.61) -> prune
    assert(DedupQueries.singletonPruningPaysOff(
      DedupQueries.shingleIndex(spark, sf0001)))
  }

  test("adaptive guard flips between synthetic big-vocab and hot-vocab corpora") {
    // big vocab: every doc contributes mostly unique shingles -> the
    // stats pass votes to prune (the realistic web-corpus economics)
    val bigVocab = (1 to 200).flatMap(d =>
      (1 to 10).map(i => (d.toLong, s"uniq_${d}_$i"))).toDF("doc_id", "s")
    assert(DedupQueries.singletonPruningPaysOff(bigVocab))
    // hot vocab: 200 docs drawing from 20 shingles -> every shingle is
    // common, pruning buys nothing -> off (this fixture's sf0.1 shape)
    val hotVocab = (1 to 200).flatMap(d =>
      (1 to 10).map(i => (d.toLong, s"hot_${i % 20}"))).toDF("doc_id", "s")
    assert(!DedupQueries.singletonPruningPaysOff(hotVocab))
    // and the registered path produces identical pairs to both fixed
    // settings regardless of which branch the stats chose
    val sh = DedupQueries.shingleIndex(spark, sf0001).localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6))
        .as[(Long, Long, Double)].collect().toSet
    val adaptive = pairs(DedupQueries.exactJaccardPairs(spark, sf0001))
    assert(adaptive == pairs(DedupQueries.exactJaccardOn(sh, true)))
    assert(adaptive == pairs(DedupQueries.exactJaccardOn(sh, false)))
  }

  test("native NearestCell == composed array_min assignment on fixture vectors") {
    // cell assignment decides centroids, so the native form must be
    // bit-identical to the composed one or IVF results silently drift
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = SimilarityQueries.ivfCentroids(e, k = 16, iters = 2)
    val native = SimilarityQueries.assignCells(e, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val composed = SimilarityQueries.assignCellsComposed(e, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(native.nonEmpty && native == composed)
    // ties and all: every cell in range
    assert(native.values.forall(c => c >= 0 && c < 16))
  }

  test("banded KNN join: full coverage and high agreement with exact NN") {
    val exact = SimilarityQueries.queries("sim_nn_cross_label")(spark, sf001)
      .select("qid", "nn_id").as[(Long, Long)].collect().toMap
    // nn_id is nullable since the left-join-back change (unanswered
    // queries surface as null instead of vanishing) — decode as Option so
    // a coverage miss fails the assertion below, not the encoder
    val bandedRows = SimilarityQueries.queries("sim_knn_banded")(spark, sf001)
      .select("qid", "nn_id").as[(Long, Option[Long])].collect()
    val unanswered = bandedRows.filter(_._2.isEmpty).map(_._1)
    assert(unanswered.isEmpty, s"unanswered queries: ${unanswered.toSeq}")
    val banded = bandedRows.collect { case (q, Some(nn)) => q -> nn }.toMap
    // coverage: every query that has an exact NN gets SOME banded answer
    assert(banded.keySet == exact.keySet,
      s"missing=${exact.keySet.diff(banded.keySet)}")
    // agreement: the ±1-band probe window covers any NN with cos >= 0.2,
    // so on this corpus most answers are identical — pin a floor
    val agree = exact.count { case (q, nn) => banded.get(q).contains(nn) }
    assert(agree.toDouble / exact.size >= 0.8,
      s"agreement=$agree/${exact.size}")
  }

  test("ivf ann: recall vs brute force and sane cell assignment") {
    val brute = SimilarityQueries.queries("sim_topk_bruteforce")(spark, sf001)
      .select("vec_id").as[Long].collect().toSet
    val ivf = SimilarityQueries.queries("sim_ann_ivf")(spark, sf001)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.size == 10)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // 4 of 16 cells probed on a diffuse corpus — floor matches sim_ann_lsh
    assert(recall >= 0.3, s"recall=$recall")
    // every vector lands in exactly one cell in [0, 16)
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val cents = SimilarityQueries.ivfCentroids(e, k = 16, iters = 2)
    assert(cents.size == 16 && cents.forall(_.size == 64))
    val cells = SimilarityQueries.assignCells(e, cents)
      .groupBy("cell").count().as[(Int, Long)].collect()
    assert(cells.map(_._2).sum == e.count())
    assert(cells.forall { case (c, _) => c >= 0 && c < 16 })
    // the quantizer actually partitions (not everything in one cell)
    assert(cells.length > 1)
  }

  test("eval_ann_recall: plain-Scala replay agrees exactly; aggregate recall sane") {
    val ann = SimilarityQueries.queries("sim_ann_batch")(spark, sf001)
      .filter(col("nn_id").isNotNull)
      .select("qid", "rank", "nn_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(r => r._3 -> r._2).toMap } // nn_id -> rank
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    def cosR(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = vecs.filter(_._2 == 0)
    val expected = queries.map { case (qid, _, qv) =>
      val gt = vecs.filter(_._1 != qid)
        .map { case (cid, _, cv) => (cid, cosR(cv, qv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(10).map(_._1)
      val ranks = ann.getOrElse(qid, Map.empty)
      val hits = gt.count(ranks.contains)
      val rr = ranks.get(gt.head).map(10000L / _).getOrElse(0L)
      qid -> ((hits.toLong, rr))
    }.toMap
    val out = SimilarityQueries.queries("eval_ann_recall")(spark, sf001)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (q, got) =>
      assert(got == expected(q), s"q=$q: $got vs ${expected(q)}") }
    // aggregate sanity: 4/16 probed cells on the diffuse fixture — the
    // same floor the single-probe ivf pin uses
    val meanRecall = out.values.map(_._1).sum.toDouble / (10.0 * out.size)
    assert(meanRecall >= 0.3, s"mean recall $meanRecall")
    assert(out.values.forall { case (h, rr) =>
      h >= 0 && h <= 10 && (rr == 0 || (rr >= 1000 && rr <= 10000)) })
  }

  test("persisted ivf index: equal to in-memory ivf, only probed cell partitions scanned") {
    val mem = SimilarityQueries.queries("sim_ann_ivf")(spark, sf001)
      .as[(Long, Double)].collect().toSeq
    val writesBefore = SimilarityQueries.ivfIndexWrites.get()
    val idx = SimilarityQueries.queries("sim_ann_ivf_indexed")(spark, sf001)
    val got = idx.as[(Long, Double)].collect().toSeq
    // same centroids (deterministic k-means), same probe, same rerank —
    // the persisted path must change WHERE the data is read, not the answer
    assert(got == mem, s"indexed=$got vs in-memory=$mem")
    // write-once contract: the index is built at most once per JVM (zero
    // times here if an earlier test already built it); a SECOND
    // invocation — construction and execution — performs no write and
    // returns the same rows. This is the production lifecycle: build
    // once, serve many.
    val writesAfterFirst = SimilarityQueries.ivfIndexWrites.get()
    assert(writesAfterFirst - writesBefore <= 1,
      s"index written ${writesAfterFirst - writesBefore}x in one invocation")
    val again = SimilarityQueries.queries("sim_ann_ivf_indexed")(spark, sf001)
      .as[(Long, Double)].collect().toSeq
    assert(SimilarityQueries.ivfIndexWrites.get() == writesAfterFirst,
      "second sim_ann_ivf_indexed invocation rewrote the persisted index")
    assert(again == mem)
    // partition pruning: re-derive the (deterministic) probe cells and
    // observe the actual scan — files READ must all come from probed cell
    // directories, and the filter must reach the listing as a
    // PartitionFilter (Dataset.inputFiles reports the PRE-pruning index,
    // so observe rows via input_file_name, the LayoutSpec pattern)
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = SimilarityQueries.ivfCentroids(e, k = 16, iters = 2)
    val qv = e.filter(col("vec_id") === 0).select("v")
      .as[Seq[Double]].head()
    val probe = cents.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum) }
      .sortBy(_._2).take(4).map(_._1).toSet
    val probed = spark.read
      .parquet(SimilarityQueries.ivfIndexPath(sf001))
      .filter(col("cell").isin(probe.toSeq: _*))
    val cellsRead = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
      .flatMap(_.split("/").find(_.startsWith("cell=")))
      .map(_.stripPrefix("cell=").toInt).toSet
    assert(cellsRead.nonEmpty && cellsRead.subsetOf(probe),
      s"files read from unprobed cells: ${cellsRead -- probe}")
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(800))
    // and the index on disk holds MORE cells than were probed — the
    // pruning assertion above is only meaningful if unprobed cells exist
    val allCells = spark.read
      .parquet(SimilarityQueries.ivfIndexPath(sf001))
      .select("cell").distinct().as[Int].collect().toSet
    assert((allCells -- probe).nonEmpty,
      s"fixture degenerate: all ${allCells.size} cells probed")
  }

  test("batched ann: coverage of every query and per-query recall vs brute force") {
    val batch = SimilarityQueries.queries("sim_ann_batch")(spark, sf001)
      .select(col("qid"), col("rank"), col("nn_id")).collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_ => r.getLong(2))))
    // coverage: EVERY label-0 query appears at least once (the left-join
    // guarantee — a query with no candidates still yields a null row)
    val qids = Tables.embeddings(spark, sf001)
      .filter(col("label") === 0).select("vec_id").as[Long].collect().toSet
    assert(batch.map(_._1).toSet == qids,
      s"missing queries: ${qids -- batch.map(_._1).toSet}")
    // at most 10 results per query
    val perQ = batch.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet)
    assert(perQ.values.forall(_.size <= 10))
    // per-query brute-force top-10 (corpus = everything but self, same
    // tie rule as TopKAggregator: cos desc, id asc)
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byId = e.toMap
    val recalls = qids.toSeq.map { q =>
      val qv = byId(q)
      val bf = e.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      perQ(q).intersect(bf).size.toDouble / bf.size
    }
    val meanRecall = recalls.sum / recalls.size
    // nProbe=4 of k=16 cells on a diffuse corpus: same floor doctrine as
    // the single-probe IVF/LSH tests (clustered real embeddings would be
    // far higher); the MEAN over 50 queries is a much tighter pin than
    // one probe's point estimate
    assert(meanRecall >= 0.3, s"mean recall=$meanRecall")
    // and no query should be a total miss while its cells held candidates:
    // at least half the queries individually clear the floor
    assert(recalls.count(_ >= 0.3) >= recalls.size / 2,
      s"per-query recalls below floor: ${recalls.count(_ < 0.3)}")
  }

  test("lsh bucket sign margins are far from zero (cross-engine oracle safety)") {
    // sim_ann_lsh now has a REAL DuckDB oracle: the fixed-seed planes are
    // embedded as double literals and the bucket is recomputed in SQL.
    // The only cross-engine hazard is a dot product so close to 0 that
    // IEEE summation-order differences could flip its sign and change a
    // bucket bit. Pin the margin: the smallest |dot(v, plane)| over the
    // whole fixture × all 6 planes must dwarf any accumulated ULP error
    // (64 terms of O(10) magnitude ⇒ error < ~1e-12).
    val planes = SimilarityQueries.hyperplanes(6, 64)
    Seq(sf001, sf01).foreach { sf =>
      val minAbs = Tables.embeddings(spark, sf)
        .select(col("embedding").cast("array<double>").as("v"))
        .select(least(planes.map(p => abs(graft.functions.VectorFunctions
          .dot(col("v"), typedlit(p)))): _*).as("m"))
        .agg(min(col("m"))).as[Double].head()
      assert(minAbs > 1e-6, f"$sf sign margin $minAbs%.3g too small for a " +
        "cross-engine exact oracle — regenerate planes or drop the oracle")
    }
  }

  test("ivf assignment and probe margins dwarf ULP wobble (cross-engine oracle safety)") {
    // sim_ann_ivf(_indexed) now carry a REAL DuckDB oracle that re-runs
    // the whole deterministic k-means in SQL. The engines' d = |c|²−2·v·c
    // accumulations can differ in the last bit, so exactness requires
    // every cell DECISION to have a margin far above that wobble
    // (≲ dim·|v|·ulp ≈ 1e-13): for each Lloyd stage's centroids, the gap
    // between best and second-best cell per vector; and for the probe,
    // the gap between the 4th and 5th nearest cell to the query. Runs at
    // BOTH fixture scales — the oracle gate verifies both, so an
    // unpinned sf0.1 near-tie would make the gate flaky while this spec
    // stayed green (review-caught). An exact-equality escape is sound
    // ONLY when the tied decision's INPUTS are elementwise identical
    // (then both engines compute bit-equal values and tiebreak by the
    // same index); equal computed values from DISTINCT inputs can still
    // differ by 1 ULP under the other engine's accumulation order, so
    // they must satisfy the margin (review-caught, round 2).
    def dists(v: Seq[Double], cents: Seq[Seq[Double]]): Seq[Double] =
      cents.map { c =>
        val cSq = c.map(x => x * x).sum
        val dot = c.lazyZip(v).map(_ * _).sum
        cSq - dot * 2
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      a.indices.foreach { i =>
        sab += a(i) * b(i); saa += a(i) * a(i); sbb += b(i) * b(i)
      }
      sab / math.sqrt(saa * sbb)
    }
    Seq(sf001, sf01).foreach { sf =>
      val vecs = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .as[(Long, Seq[Double])].collect()
      // fixture sanity the oracles' degenerate-row doctrine assumes: no
      // null vectors, uniform dimension. (A null ELEMENT cannot survive
      // to this assert — the non-nullable decode above throws — which
      // is itself the loud pin for that shape.)
      assert(vecs.forall { case (_, v) => v != null && v.length == 64 },
        s"$sf holds a degenerate embedding row")
      val byId = vecs.toMap
      val e = SimilarityQueries.rawVecs(spark, sf)
      val stages = Seq(0, 1, 2).map(it =>
        it -> SimilarityQueries.ivfCentroids(e, k = 16, iters = it))
      // margin between two (distance, cell) decisions: exact ties are
      // safe only for elementwise-identical centroids
      def cellMargin(sorted: Seq[(Double, Int)], lo: Int, hi: Int,
          cents: Seq[Seq[Double]], what: String): Unit = {
        val safeTie = sorted(hi)._1 == sorted(lo)._1 &&
          cents(sorted(hi)._2) == cents(sorted(lo)._2)
        assert(safeTie || sorted(hi)._1 - sorted(lo)._1 > 1e-9,
          f"$sf $what margin ${sorted(hi)._1 - sorted(lo)._1}%.3g too small " +
            "for a cross-engine exact oracle")
      }
      stages.foreach { case (it, cents) =>
        vecs.foreach { case (id, v) =>
          cellMargin(dists(v, cents).zipWithIndex.sorted, 0, 1, cents,
            s"vec $id iter-$it assignment")
        }
      }
      val cents = stages.last._2
      cellMargin(dists(byId(0L), cents).zipWithIndex.sorted, 3, 4, cents,
        "probe 4th/5th-cell")
      // sim_ann_batch's extra surfaces: every label-0 query's own probe
      // boundary, and — because its top-10 ranks by RAW cosine —
      // adjacent candidate cosines per query (ties safe only for
      // elementwise-identical candidate vectors)
      val cell: Map[Long, Int] = vecs.iterator.map { case (id, v) =>
        id -> dists(v, cents).zipWithIndex.min._2
      }.toMap
      def cosMargin(sorted: Seq[(Double, Long)], qid: Long, what: String): Unit =
        sorted.lazyZip(sorted.drop(1)).foreach {
          case ((lo, lid), (hi, hid)) =>
            val safeTie = hi == lo && byId(lid) == byId(hid)
            assert(safeTie || hi - lo > 1e-9,
              f"$sf query $qid $what cos gap ${hi - lo}%.3g too small")
        }
      val qset = Tables.embeddings(spark, sf).filter(col("label") === 0)
        .select("vec_id").as[Long].collect()
      qset.foreach { qid =>
        val qVec = byId(qid)
        cellMargin(dists(qVec, cents).zipWithIndex.sorted, 3, 4, cents,
          s"query $qid probe")
        val probed = dists(qVec, cents).zipWithIndex.sortBy(_._1)
          .take(4).map(_._2).toSet
        cosMargin(vecs.iterator
          .filter { case (id, _) => id != qid && probed(cell(id)) }
          .map { case (id, v) => (cos(qVec, v), id) }.toSeq.sorted,
          qid, "adjacent candidate")
      }
      // sim_knn_banded's surfaces: floor(dot/W) flips only if dot/W sits
      // on an integer (distance to the nearest integer pinned), and the
      // per-query argmax needs a best/second-best raw-cos gap
      val w0 = SimilarityQueries.bandW0
      val bw = SimilarityQueries.bandW
      val labels: Map[Long, Int] = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
      val banded = vecs.map { case (id, v) =>
        val proj = w0.lazyZip(v).map(_ * _).sum / bw
        assert(math.abs(proj - math.rint(proj)) > 1e-9,
          f"$sf vec $id band projection $proj%.12f sits on a floor boundary")
        (id, labels(id), v, math.floor(proj).toLong)
      }
      val cands = banded.filter(_._2 == 1)
      banded.filter(_._2 == 0).foreach { case (qid, _, qVec, qBand) =>
        val cs = cands.filter { case (_, _, _, cb) =>
          cb >= qBand - 1 && cb <= qBand + 1
        }.map { case (id, _, v, _) => (cos(qVec, v), id) }
          .sortBy { case (c, id) => (-c, id) }
        if (cs.size >= 2)
          cosMargin(Seq(cs(1), cs(0)).map { case (c, id) => (c, id) },
            qid, "banded argmax")
      }
      // dedup_semantic's surface: every CLUSTER-LOCAL pair's threshold
      // decision — |cos − τ| must dwarf cross-engine accumulation wobble
      // (no tie escape: a pair of identical vectors has cos = 1, far
      // from τ, so any value near τ is a genuine near-boundary hazard)
      val byCell = vecs.groupBy { case (id, _) => cell(id) }
      byCell.values.foreach { members =>
        for {
          i <- members.indices; j <- 0 until i
          c = cos(members(i)._2, members(j)._2)
        } assert(math.abs(c - graft.queries.DedupQueries.SemThreshold) > 1e-9,
          f"$sf pair ${members(j)._1}/${members(i)._1} cos $c%.12f sits " +
            "on the dedup_semantic threshold")
      }
      // curate_prototypes' surface: within-cluster adjacent dist-to-
      // centroid gaps (its ranking is cross-engine only if no two
      // DISTINCT rows in a cell are ULP-close; elementwise-identical
      // vectors produce bit-equal distances in both engines and
      // tiebreak by vec_id identically — the safe-tie escape)
      byCell.foreach { case (c, members) =>
        val cv = cents(c)
        val ds = members.map { case (id, v) =>
          val vv = v.map(x => x * x).sum
          val cc = cv.map(x => x * x).sum
          val vc = v.lazyZip(cv).map(_ * _).sum
          (vv + cc - 2 * vc, id)
        }.sorted
        ds.lazyZip(ds.drop(1)).foreach { case ((lo, lid), (hi, hid)) =>
          val safeTie = hi == lo && byId(lid) == byId(hid)
          assert(safeTie || hi - lo > 1e-9,
            f"$sf cell $c rows $lid/$hid dist gap ${hi - lo}%.3g too " +
              "small for curate_prototypes' cross-engine ranking")
        }
      }
    }
  }

  test("dedup_semantic: cluster-local lowest-id-wins, matches independent reimplementation") {
    // Independent Scala reimplementation on collected vectors (argmin
    // assignment + pairwise rule) — the oracle gate is the heavy check;
    // this pins the SEMANTICS against a second implementation and that
    // the fixture exercises both branches (some dups, some survivors).
    def dists(v: Seq[Double], cents: Seq[Seq[Double]]): Seq[Double] =
      cents.map { c =>
        c.map(x => x * x).sum - c.lazyZip(v).map(_ * _).sum * 2
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      a.indices.foreach { i =>
        sab += a(i) * b(i); saa += a(i) * a(i); sbb += b(i) * b(i)
      }
      sab / math.sqrt(saa * sbb)
    }
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val cents = SimilarityQueries.ivfModel(spark, sf001)
    val cell = vecs.map { case (id, v) =>
      id -> dists(v, cents).zipWithIndex.min._2 }.toMap
    val expected = vecs.map { case (id, v) =>
      val isDup = vecs.exists { case (pid, pv) =>
        pid < id && cell(pid) == cell(id) &&
          cos(v, pv) >= graft.queries.DedupQueries.SemThreshold
      }
      (id, cell(id), isDup)
    }.toSet
    val got = graft.queries.DedupQueries.queries("dedup_semantic")(spark, sf001)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(got == expected)
    val nDup = expected.count(_._3)
    assert(nDup > 0 && nDup < vecs.length,
      s"fixture exercises only one branch: $nDup dups of ${vecs.length}")
    // lowest-id-wins sanity: the smallest id of every cluster survives
    cell.groupBy(_._2).values.foreach { m =>
      val first = m.keys.min
      assert(!expected(((first, cell(first), true))),
        s"cluster seed $first marked dup")
    }
  }

  test("curate_prototypes: keeps exactly max(1, floor(3n/4)) per cluster, most-distant first") {
    val out = graft.queries.CurationQueries
      .queries("curate_prototypes")(spark, sf001)
      .as[(Long, Int, Boolean)].collect()
    val cents = SimilarityQueries.ivfModel(spark, sf001)
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def distSq(v: Seq[Double], c: Seq[Double]): Double =
      v.map(x => x * x).sum + c.map(x => x * x).sum -
        2 * v.lazyZip(c).map(_ * _).sum
    assert(out.map(_._1).toSet == vecs.keySet) // verdict for every row
    out.groupBy(_._2).foreach { case (c, members) =>
      val n = members.length
      val kept = members.filter(_._3)
      val want = math.max(1, n * 3 / 4)
      assert(kept.length == want,
        s"cell $c kept ${kept.length} of $n, want $want")
      // the kept set is the most-distant-from-centroid rows: no kept
      // distance falls below any dropped distance (>= not >, because the
      // margins spec's safe-tie escape permits bit-identical vectors,
      // whose equal distances may straddle the keep boundary — both
      // engines then tiebreak by vec_id identically)
      val dropped = members.filterNot(_._3)
      if (kept.nonEmpty && dropped.nonEmpty) {
        val minKept = kept.map(m => distSq(vecs(m._1), cents(c))).min
        val maxDropped = dropped.map(m => distSq(vecs(m._1), cents(c))).max
        assert(minKept >= maxDropped,
          s"cell $c kept a nearer row than one it dropped")
      }
    }
  }

  test("ann recall@10 curve vs nProbe: monotone, exact at full probe") {
    // The nProbe knob's quality trade, MEASURED: mean recall@10 of
    // annBatch over all label-0 queries for nProbe in {1,2,4,8,16}.
    // Monotone non-decreasing by construction — probeCells(n) is a
    // prefix of probeCells(n+1), so candidate pools grow superset-wise,
    // and any true-top-10 member in the pool always makes the top-k (it
    // outranks every non-member by definition). At nProbe=16 (= all
    // cells) the pool is the whole corpus minus self: recall must be
    // EXACTLY 1.0 — an equality anchor, not a floor.
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byId = e.toMap
    val qids = Tables.embeddings(spark, sf001)
      .filter(col("label") === 0).select("vec_id").as[Long].collect().toSet
    val truth: Map[Long, Set[Long]] = qids.toSeq.map { q =>
      val qv = byId(q)
      q -> e.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    }.toMap
    val curve = Seq(1, 2, 4, 8, 16).map { np =>
      val got = SimilarityQueries.annBatch(spark, sf001, np)
        .filter(col("nn_id").isNotNull)
        .select("qid", "nn_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val mean = qids.toSeq.map { q =>
        got.getOrElse(q, Set.empty[Long]).intersect(truth(q)).size.toDouble /
          truth(q).size
      }.sum / qids.size
      np -> mean
    }
    info(curve.map { case (np, r) => f"nProbe=$np%2d:$r%.3f" }.mkString("  "))
    curve.sliding(2).foreach {
      case Seq((n1, r1), (n2, r2)) =>
        assert(r2 >= r1 - 1e-12,
          s"recall not monotone: nProbe=$n1 $r1 -> nProbe=$n2 $r2")
      case _ =>
    }
    assert(curve.last._2 == 1.0,
      s"full probe must be exhaustive: ${curve.last}")
    assert(curve.head._2 < 1.0,
      "fixture degenerate: single-probe already exhaustive — curve pins nothing")
  }

  test("connected components: long chains, stars, and singleton isolation") {
    import graft.queries.DedupQueries
    // a 12-node chain (worst case for plain neighbor-min: diameter
    // rounds; pointer jumping must still reach the same fixpoint), a
    // star, a 2-cycle pair, and disjoint nodes
    val chain = (0L until 11L).map(i => (100L + i, 100L + i + 1))
    val star = Seq((200L, 201L), (200L, 202L), (200L, 203L))
    val pair = Seq((301L, 300L))
    val pairs = (chain ++ star ++ pair).toDF("doc_a", "doc_b")
    val labels = DedupQueries.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((100L to 111L).forall(labels(_) == 100L),
      s"chain must collapse to its min: ${(100L to 111L).map(labels)}")
    assert((200L to 203L).forall(labels(_) == 200L))
    assert(labels(300L) == 300L && labels(301L) == 300L)
    // only edge-touched nodes get labels (callers left-join the corpus)
    assert(labels.keySet == ((100L to 111L) ++ (200L to 203L)
      ++ Seq(300L, 301L)).toSet)
  }

  test("rolling fingerprint: equal docs equal, reorder changes, order-sensitive") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "d c b a"), (4L, "a b c e"))
      .toDF("id", "text")
      .select(col("id"),
        TextFunctions.rollingFingerprint(
          TextFunctions.tokens(col("text"))).as("fp"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))        // identical text -> identical fingerprint
    assert(m(1L) != m(3L))        // reordered tokens -> different (order-sensitive)
    assert(m(1L) != m(4L))        // changed token -> different
    assert(m.values.forall(v => v >= 0 && v < 2147483647L))
  }

  test("simhash: identical docs identical; near-dup closer than random") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words here nothing shared at all whatsoever"))
      .toDF("id", "text")
      .select(col("id"),
        TextFunctions.simHash(TextFunctions.tokens(col("text"))).as("sig"))
    val m = df.as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) == m(2L))
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
  }

  test("dedup_exact marks planted identical texts") {
    import spark.implicits._
    // synthesize exact dups to prove the canonical-id assignment
    val df = Seq((1L, "x y z"), (2L, "x y z"), (3L, "p q r"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    val out = df.withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canonical_id"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("dedup_editdist: pairs verify the edit-ratio bound; planted edit found") {
    // planted: doc 2 is doc 1 with one word substituted (distance = word
    // length diff bounded), doc 3 unrelated — only (1,2) should survive
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappz"),
      (3L, "totally different content with no overlap whatsoever here ok"))
      .toDF("doc_id", "text")
    val d12 = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1L && col("b.doc_id") === 2L)
      .select(levenshtein(col("a.text"), col("b.text"))).as[Int].head()
    assert(d12 == 1) // one substituted character
    // registered query on the fixture: every emitted pair honors the
    // integer bound dist*20 <= max(len) recomputed from raw text
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val out = queries.DedupQueries.queries("dedup_editdist")(spark, sf0001)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    for ((a, b, dist) <- out) {
      val ml = math.max(texts(a).length, texts(b).length)
      assert(dist * 20 <= ml, s"pair ($a,$b) dist=$dist max_len=$ml")
      assert(a < b)
    }
  }

  test("sim_rp_reduce: bit-exact vs plain-Scala left-assoc chains; " +
    "JL preserves norms and dot products within pinned distortion") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val out = SimilarityQueries.queries("sim_rp_reduce")(spark, sf0001)
      .as[(Long, Int, Double)].collect()
    assert(out.length == emb.size * 16)
    // exactness: the registered query must equal the strict
    // left-to-right chain — this is the order the generated DuckDB
    // oracle unrolls, so drift here means the oracle technique broke
    val m = SimilarityQueries.rpMatrix
    out.foreach { case (id, j, got) =>
      var acc = 0.0
      val v = emb(id); val w = m(j)
      var i = 0
      while (i < 64) { acc = acc + v(i) * w(i); i += 1 }
      assert(got == acc, s"vec $id dim $j: $got != $acc (bitwise)")
    }
    // JL property, realized on this fixture: E[<Rx,Ry>] = <x,y> with
    // sd ≈ √(1+cos²)/4 ≤ 0.35 of ‖x‖‖y‖ at k=16, so the pins are the
    // JL statement itself — per-vector norm ratios bounded, and the
    // NORMALIZED dot error |<Rx,Ry>−<x,y>|/(‖x‖‖y‖) small in mean and
    // tail. (NOT correlation: most fixture pairs are near-orthogonal,
    // so signal variance ≪ JL noise and correlation is meaninglessly
    // low even when every error honors the bound.) Deterministic
    // fixture + fixed matrix ⇒ pins, not flaky statistics (observed at
    // sf0.01: ratios 0.16–2.13, err mean 0.19, p95 0.47, max 0.86 —
    // margins below ~2× looser; theory: mean ≈ 0.8·sd ≈ 0.23, max
    // over 780 pairs ≈ 3.5·sd ≈ 1.2).
    val red = out.groupBy(_._1).map { case (id, rows) =>
      id -> rows.sortBy(_._2).map(_._3).toSeq }
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    red.foreach { case (id, r) =>
      val ratio = dot(r, r) / dot(emb(id), emb(id))
      assert(ratio > 0.1 && ratio < 5.0, s"vec $id norm ratio $ratio")
    }
    val ids = emb.keys.toSeq.sorted.take(40)
    val errs = ids.combinations(2).map { case Seq(a, b) =>
      math.abs(dot(red(a), red(b)) - dot(emb(a), emb(b))) /
        math.sqrt(dot(emb(a), emb(a)) * dot(emb(b), emb(b)))
    }.toSeq
    val meanErr = errs.sum / errs.size
    assert(meanErr < 0.5, s"mean normalized dot error $meanErr")
    assert(errs.max < 2.0, s"max normalized dot error ${errs.max}")
  }

  test("pq subspace assignments, adc ranking, and rounding margins dwarf ULP wobble") {
    // sim_ann_pq_adc carries a real generated DuckDB oracle (four
    // unrolled per-subspace Lloyd chains + ADC lookup tables), so its
    // cross-engine surfaces need the same pins as the IVF family:
    //  1. per-subspace cell assignment margins at every Lloyd stage
    //     (best vs second-best d, exact ties safe only for elementwise-
    //     identical centroids);
    //  2. adjacent candidate adc gaps ≫ ULP (the top-10 cut and the
    //     ordering are over rounded adc with id tiebreaks, so distinct
    //     raw values must not be ULP-close);
    //  3. a rounding-boundary pin: no candidate's raw adc sits within
    //     1e-9 of a 0.5e-6 round-half boundary, where a last-bit
    //     accumulation difference would flip the 6th decimal.
    import SimilarityQueries.{pqM, pqSub}
    def dists(v: Seq[Double], cents: Seq[Seq[Double]]): Seq[Double] =
      cents.map { c =>
        val cSq = c.map(x => x * x).sum
        val dot = c.lazyZip(v).map(_ * _).sum
        cSq - dot * 2
      }
    Seq(sf001, sf01).foreach { sf =>
      val vecs = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .as[(Long, Seq[Double])].collect()
      val byId = vecs.toMap
      val qv = byId(0L)
      val cbs = SimilarityQueries.pqModel(spark, sf)
      assert(cbs.size == pqM && cbs.forall(_.size == 16))
      // 1. assignment margins per subspace per Lloyd stage
      for (j <- 0 until pqM) {
        val sube = SimilarityQueries.rawVecs(spark, sf)
          .select(col("vec_id"),
            slice(col("v"), j * pqSub + 1, pqSub).as("v"))
        Seq(0, 1, 2).foreach { it =>
          val cents = SimilarityQueries.ivfCentroids(sube, k = 16, iters = it)
          vecs.foreach { case (id, v) =>
            val sv = v.slice(j * pqSub, (j + 1) * pqSub)
            val sorted = dists(sv, cents).zipWithIndex.sorted
            val safeTie = sorted(1)._1 == sorted(0)._1 &&
              cents(sorted(1)._2) == cents(sorted(0)._2)
            assert(safeTie || sorted(1)._1 - sorted(0)._1 > 1e-9,
              f"$sf vec $id sub-$j iter-$it assignment margin " +
                f"${sorted(1)._1 - sorted(0)._1}%.3g too small")
          }
        }
        // final codebooks the query serves must equal the stage-2 rerun
        assert(cbs(j) == SimilarityQueries.ivfCentroids(sube, 16, 2))
      }
      // driver-side adc per candidate, same associativity as the query
      val luts = cbs.zipWithIndex.map { case (cb, j) =>
        val qj = qv.slice(j * pqSub, (j + 1) * pqSub)
        val qSq = qj.map(x => x * x).sum
        cb.map { c =>
          val cSq = c.map(x => x * x).sum
          val qc = c.zip(qj).map { case (a, b) => a * b }.sum
          (cSq - 2 * qc) + qSq
        }
      }
      val codes: Map[Long, Seq[Int]] = vecs.iterator.map { case (id, v) =>
        id -> (0 until pqM).map { j =>
          dists(v.slice(j * pqSub, (j + 1) * pqSub), cbs(j))
            .zipWithIndex.min._2
        }
      }.toMap
      val adcs = vecs.filter(_._1 != 0L).map { case (id, v) =>
        ((0 until pqM).map(j => luts(j)(codes(id)(j))).reduce(_ + _), id)
      }
      // 2. adjacent distinct-adc gaps. The safe-tie escape is EQUAL CODE
      // TUPLES, not equal vectors: adc is a function of (codes, shared
      // LUT) only, so same codes ⇒ bit-equal adc in both engines — and
      // PQ quantization maps many distinct vectors to the same codes by
      // design. An exact tie with DIFFERENT codes is the real hazard
      // (two independent accumulations could split at ULP) and must
      // satisfy the margin.
      val sorted = adcs.sorted.toSeq
      sorted.lazyZip(sorted.drop(1)).foreach { case ((lo, lid), (hi, hid)) =>
        val safeTie = hi == lo && codes(lid) == codes(hid)
        assert(safeTie || hi - lo > 1e-9,
          f"$sf adc gap ${hi - lo}%.3g between vec $lid and $hid too small")
      }
      // 3. rounding-boundary distance — scoped to the oracle's actual
      // compare surface: the 10 emitted rows plus the cut neighborhood
      // (a boundary flip of a near-cut candidate could promote/demote
      // it across the LIMIT). Deep-tail candidates never reach the
      // artifact, so their boundary proximity is harmless.
      sorted.take(12).foreach { case (adc, id) =>
        val frac = adc * 1e6
        val d = math.abs(frac - math.floor(frac) - 0.5)
        assert(d > 1e-3, // 1e-3 of a 1e-6 unit = 1e-9 absolute
          f"$sf vec $id adc $adc%.12f sits on a round-6 boundary")
      }
      // sanity: the registered query's top-10 equals the driver replay
      def roundedTop10(cands: Seq[(Double, Long)]): Seq[(Long, Double)] =
        cands.map { case (a, id) =>
          // Spark's round() is BigDecimal HALF_UP, not rint (half-even)
          (id, BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble) }
          .sortBy { case (id, a) => (a, id) }.take(10)
      val got = SimilarityQueries.queries("sim_ann_pq_adc")(spark, sf)
        .as[(Long, Double)].collect().toSeq
      val want = roundedTop10(adcs.toSeq)
      assert(got.toSeq == want, s"$sf got=${got.toSeq} want=$want")
      // sim_ann_ivfpq's extra surfaces: the COARSE probe decision is
      // already pinned by the ivf margin spec; what's new is the ADC
      // ranking over the probed SUBSET — its emitted top-12 needs its
      // own rounding-boundary pin (a deep-tail candidate of the full
      // ranking can be a top-10 row of the subset), and the query must
      // equal the driver replay of probe→filter→rank.
      val coarse = SimilarityQueries.ivfModel(spark, sf)
      val probed = dists(qv, coarse).zipWithIndex.sorted.take(4)
        .map(_._2).toSet
      val cellOf: Map[Long, Int] = vecs.iterator.map { case (id, v) =>
        id -> dists(v, coarse).zipWithIndex.min._2 }.toMap
      val subset = adcs.filter { case (_, id) => probed(cellOf(id)) }
      subset.sorted.take(12).foreach { case (adc, id) =>
        val frac = adc * 1e6
        val dd = math.abs(frac - math.floor(frac) - 0.5)
        assert(dd > 1e-3,
          f"$sf ivfpq vec $id adc $adc%.12f sits on a round-6 boundary")
      }
      val gotI = SimilarityQueries.queries("sim_ann_ivfpq")(spark, sf)
        .as[(Long, Double)].collect().toSeq
      assert(gotI == roundedTop10(subset.toSeq),
        s"$sf ivfpq got=$gotI want=${roundedTop10(subset.toSeq)}")
    }
  }

  test("kcenter selection and assignment margins dwarf ULP wobble; " +
    "plain-Scala greedy replay agrees") {
    // sample_kcenter emits decisions only, so its cross-engine surfaces
    // are (a) each greedy round's farthest-point argmax (top-1 vs top-2
    // running-min-distance gap) and (b) every vector's nearest-center
    // assignment (best vs second-best). Ties escape only when the tied
    // inputs are elementwise identical (the ivf doctrine).
    def dists(v: Seq[Double], cents: Seq[Seq[Double]]): Seq[Double] =
      cents.map { c =>
        val cSq = c.map(x => x * x).sum
        val dot = c.lazyZip(v).map(_ * _).sum
        cSq - dot * 2
      }
    Seq(sf001, sf01).foreach { sf =>
      val vecs = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      // greedy replay
      var centers = Vector(vecs.head)
      for (round <- 2 to 8) {
        val ranked = vecs.map { case (id, v) =>
          val vv = v.map(x => x * x).sum
          (dists(v, centers.map(_._2)).min + vv, id, v)
        }.sortBy { case (m, id, _) => (-m, id) }
        val (top, second) = (ranked(0), ranked(1))
        assert(top._1 - second._1 > 1e-9 ||
          (top._1 == second._1 && top._3 == second._3),
          f"$sf round $round argmax margin ${top._1 - second._1}%.3g")
        centers :+= ((top._2, top._3))
      }
      val byId = vecs.toMap
      val cvs = centers.map(_._2)
      val asg = vecs.map { case (id, v) =>
        val ds = dists(v, cvs).zipWithIndex.sorted
        val safeTie = ds(1)._1 == ds(0)._1 && cvs(ds(1)._2) == cvs(ds(0)._2)
        assert(safeTie || ds(1)._1 - ds(0)._1 > 1e-9,
          f"$sf vec $id assignment margin ${ds(1)._1 - ds(0)._1}%.3g")
        (id, centers(ds(0)._2)._1, ds(0)._2 + 1)
      }.toSet
      val got = SimilarityQueries.queries("sample_kcenter")(spark, sf)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == asg.map { case (id, cid, rnd) => (id, cid, rnd) },
        s"$sf kcenter drifted: ${got.diff(asg).take(3)}")
    }
  }

  test("mm_caption_align: cosine bounds, threshold consistency, and the " +
    "screen bites both ways") {
    val out = graft.multimodal.Multimodal.queries("mm_caption_align")(
      spark, sf001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getBoolean(2)))
    assert(out.length == 500)
    out.foreach { case (id, align, keep) =>
      align.foreach(a => assert(a >= -1.0 && a <= 1.0, s"doc $id align $a"))
      assert(keep == align.exists(_ >= 0.9), s"doc $id keep/threshold")
    }
    assert(out.exists(_._3) && out.exists(!_._3), "degenerate screen")
  }

  test("mm_phash_dct: real integer DCT pHash — small edits survive, distinct images far, query equals brute force") {
    import graft.functions.PHash64
    // spectrum-rich smooth synthetic "images": 32×32 printable-ASCII
    // planes built from a few low-frequency cosines with distinct
    // amplitudes (a degenerate plane — e.g. a pure linear gradient —
    // leaves most AC coefficients in a tie at ~0, where the median
    // threshold is meaninglessly sensitive; natural images are
    // spectrum-rich, so the fixture must be too)
    def img(a1: Double, a2: Double, a3: Double, ph: Double): String = {
      val sb = new StringBuilder
      for (r <- 0 until 32; c <- 0 until 32) {
        val v = 79 + a1 * math.cos((r + 0.5) * math.Pi * 2 / 32 + ph) +
          a2 * math.cos((c + 0.5) * math.Pi * 3 / 32) +
          a3 * math.cos((r + c + 1) * math.Pi * 5 / 64 + ph)
        sb.append(math.min(126, math.max(32, math.round(v).toInt)).toChar)
      }
      sb.toString
    }
    val base = img(23, 11, 7, 0.0)
    val edited = {
      val a = base.toCharArray
      for (k <- 0 until 3)
        a(100 + 137 * k) = (a(100 + 137 * k) + 1).toChar
      new String(a)
    }
    val other = img(-17, 13, 9, 0.7)
    val phase = img(23, 11, 7, 1.3)
    def bytesOf(s2: String) = s2.getBytes("UTF-8")

    // 1. independent replay: the DIRECT (non-separable) DCT formula in
    // BigInt — exact integer arithmetic makes summation order
    // irrelevant, so this shares no code shape with the separable
    // two-pass impl yet must agree bit-for-bit
    def replay(payload: Array[Byte]): Long = {
      val pix = Array.tabulate(1024)(i =>
        BigInt(payload(i % payload.length) & 0xff))
      val cq = PHash64.cosQ14
      val f = for { u <- 0 until 8; v <- 0 until 8 } yield
        (for { y <- 0 until 32; x <- 0 until 32 }
          yield pix(y * 32 + x) * cq(u)(x) * cq(v)(y)).sum
      val ac = f.drop(1)
      val thr = ac.sorted.apply(31)
      ac.zipWithIndex.filter(_._1 > thr)
        .map(t => 1L << t._2).foldLeft(0L)(_ | _)
    }
    for (s2 <- Seq(base, edited, other, phase)) {
      assert(PHash64.hash(bytesOf(s2)) == replay(bytesOf(s2)))
      assert(PHash64.hash(bytesOf(s2)) >= 0, "63-bit: sign bit clear")
    }

    // 2. the pHash property: re-encode-scale perturbations (3 bytes ±1)
    // stay within the pairing radius; distinct images land far outside
    def ham(a: String, b: String): Int = java.lang.Long.bitCount(
      PHash64.hash(bytesOf(a)) ^ PHash64.hash(bytesOf(b)))
    assert(ham(base, edited) <= 3, s"edit hamming ${ham(base, edited)}")
    assert(ham(base, other) > 3 && ham(base, phase) > 3 &&
      ham(other, phase) > 3, "distinct images must not pair")

    // 3. the registered piece-blocked query equals brute force over the
    // planted corpus (pigeonhole exactness), including the exact-dup
    // pair at hamming 0, the edited pair, and the query's own planted
    // renditions (ids 16 and 23 trigger the %16 doubling / perturbation
    // families — the brute force below replays the augmentation rules
    // independently, so the in-query planting is pinned too)
    val dir = java.nio.file.Files.createTempDirectory("graft-phashdct")
      .toString
    val docs = Seq((1L, base), (2L, edited), (3L, other), (4L, phase),
      (5L, base), (16L, other), (23L, phase))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.multimodal.Multimodal.queries("mm_phash_dct")(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    // independent replay of augmentedDocs' rendition rules
    val augmented = docs ++
      docs.collect { case (id, t) if id % 16 == 0 =>
        (id + 10000000000L, t + t) } ++
      docs.collect { case (id, t)
        if id % 16 == 7 && t.head >= 32 && t.head <= 125 =>
        (id + 20000000000L, (t.head + 1).toChar + t.tail) }
    val sigs = augmented.map { case (id, t) => id -> PHash64.hash(bytesOf(t)) }
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(brute.contains((1L, 5L, 0)), "exact dup must pair at 0")
    assert(brute.exists(t => t._1 == 1L && t._2 == 2L), "edit pair")
    assert(brute.contains((16L, 10000000016L, 0)),
      "doubled rendition must pair at hamming 0 (tiling identity)")
    assert(augmented.exists(_._1 == 20000000023L),
      "perturbed rendition must be planted for id 23")
    assert(out == brute, s"query=$out brute=$brute")
  }

  test("PHash64: strict binary PGM/PPM payloads decode as real images; everything else tiles") {
    import graft.functions.PHash64
    // a 64×32 grayscale raster with genuine 2-D structure
    val w = 64; val h = 32
    val raster = Array.tabulate(h * w) { i =>
      val x = i % w; val y = i / w
      ((x * 3 + y * 5 + (x * y) % 7) % 256).toByte
    }
    def pgm(hdr: String): Array[Byte] =
      hdr.getBytes("ISO-8859-1") ++ raster
    val good = pgm(s"P5 $w $h 255\n")
    // independently-computed expected plane: nearest-neighbor resample —
    // emitted as a bare 1024-byte payload, whose TILED plane is itself
    // (p mod 1024 = p), so hash equality proves the decode produced
    // exactly this plane through a disjoint code path
    val expectedPlane = Array.tabulate(1024) { i =>
      val y = i / 32; val x = i % 32
      raster((y * h / 32) * w + (x * w / 32))
    }
    assert(PHash64.hash(good) == PHash64.hash(expectedPlane),
      "P5 decode+resample must equal the independently computed plane")
    // the decoded hash differs from what TILING the same bytes yields —
    // i.e. the PNM path demonstrably engaged (pin via a one-byte magic
    // corruption, which forces the tiling fallback on identical bytes)
    val corrupted = good.clone(); corrupted(1) = '7'.toByte
    assert(PHash64.hash(good) != PHash64.hash(corrupted),
      "corrupt magic must fall back to tiling (different plane)")
    // header grammar: comments + arbitrary whitespace parse identically
    val commented = pgm(s"P5\n# a comment\n$w\t$h\n# more\n255\n")
    assert(PHash64.hash(commented) == PHash64.hash(good))
    // P6 RGB: collapse to ITU-R 601 integer luma, then same plane rule
    val rgb = new Array[Byte](h * w * 3)
    for (i <- 0 until h * w) {
      rgb(3 * i) = raster(i)
      rgb(3 * i + 1) = ((raster(i) & 0xff) / 2).toByte
      rgb(3 * i + 2) = 17
    }
    val p6 = s"P6 $w $h 255\n".getBytes("ISO-8859-1") ++ rgb
    val expectedLuma = Array.tabulate(1024) { i =>
      val y = i / 32; val x = i % 32
      val v = raster((y * h / 32) * w + (x * w / 32)) & 0xff
      ((v * 299 + (v / 2) * 587 + 17 * 114) / 1000).toByte
    }
    assert(PHash64.hash(p6) == PHash64.hash(expectedLuma),
      "P6 luma decode must equal the independently computed plane")
    // strictness: any violation tiles instead of decoding — maxval ≠ 255,
    // trailing junk, truncation, oversize dims
    val strict = Seq(
      pgm(s"P5 $w $h 254\n"),
      good ++ Array(0.toByte),
      good.dropRight(1),
      pgm(s"P5 $w $h 255\n  "), // 2 ws bytes after maxval -> length off
      (s"P5 5000 1 255\n".getBytes("ISO-8859-1") ++ raster))
    strict.foreach { payload =>
      assert(PHash64.hash(payload) != PHash64.hash(good),
        "non-conforming payload must not decode as the image")
    }
    // determinism across calls (no shared-state surprises)
    assert(PHash64.hash(good) == PHash64.hash(good.clone()))
  }

  test("mm_pipeline_e2e: stage flags consistent, renditions deduped, scene stats only for survivors") {
    val out = graft.multimodal.Multimodal
      .queries("mm_pipeline_e2e")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    // corpus = 500 fixture docs + planted renditions (only non-empty
    // docs augment; all sf0.001 docs are non-empty)
    assert(out.length > 500, s"renditions missing: ${out.length}")
    val byId = out.map(t => t._1 -> t).toMap
    out.foreach { case (id, media, aligned, dup, survives, cuts) =>
      assert(survives == (media && aligned && !dup), s"doc $id verdict")
      assert(cuts.isDefined == survives, s"doc $id scene stats gating")
      assert(!aligned || media, s"doc $id aligned without passing gate")
      assert(!dup || (media && aligned), s"doc $id dup outside stage 3")
    }
    // every doubled rendition whose original also reached stage 3 must be
    // flagged as the dominated (larger-id) side of a hamming-0 pair
    val reencoded = out.filter(t => t._1 >= 10000000000L &&
      t._1 < 20000000000L)
    assert(reencoded.nonEmpty, "doubled renditions absent")
    reencoded.foreach { case (id, media, aligned, dup, _, _) =>
      val orig = byId.get(id - 10000000000L)
      // media gate depends on byte length, which doubling changes; only
      // when BOTH sides reached the dedup stage is domination guaranteed
      if (media && aligned &&
          orig.exists(o => o._2 && o._3))
        assert(dup, s"rendition $id must be deduped against its original")
    }
    assert(out.exists(_._4), "no phash_dup rows — dedup stage vacuous")

    // round 15: the e2e corpus includes the planted strict-PNM
    // filmstrips (both families), and a surviving plant's scene stats
    // must come from the REAL per-frame perceptual hashes. Rebuild each
    // planted survivor's payload from the fixture text and recompute
    // its cuts INDEPENDENTLY via PHash64.hashBand (not via the frame
    // stage under test): reverting the frame path to the md5 fakes
    // fails this, because fake 32-hex features cut on abs-delta, not
    // hamming over the band hashes.
    val plants = out.filter(_._1 >= 30000000000L)
    assert(plants.nonEmpty, "planted conformers missing from the corpus")
    val textOf = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(b: Array[Byte]): String =
      md.digest(b).map(x => f"$x%02x").mkString
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    var checked = 0
    plants.filter(_._5).foreach { case (pid, _, _, _, _, cutsOpt) =>
      val src = pid - 30000000000L
      val (ch, rep) = if (src % 16 == 3) (1, 48) else (3, 144)
      val w = (src % 13 + 4).toInt
      val k = (src % 3 + 1).toInt
      val h = w * k
      val hex = (md5hex(textOf(src).getBytes("UTF-8")) * rep)
        .take(w * w * k * ch * 2)
      val bytes = s"P5\n$w $h\n255\n"
        .replace("P5", if (ch == 1) "P5" else "P6")
        .getBytes("US-ASCII") ++ unhex(hex)
      val hdr = graft.functions.PHash64.parsePnm(bytes)
      assert(hdr != null, s"plant $pid rebuild does not conform")
      val sigs = (0 until k).map(i =>
        graft.functions.PHash64.hashBand(bytes,
          hdr.pixelOffset + i * w * w * ch, w, w, ch))
      val expectedCuts = sigs.sliding(2).count {
        case Seq(a, b) => java.lang.Long.bitCount(a ^ b) > 10
        case _         => false
      }
      assert(cutsOpt.contains(expectedCuts.toLong),
        s"plant $pid: n_cuts ${cutsOpt} != hashBand-derived $expectedCuts")
      checked += 1
    }
    assert(checked > 0, "no planted survivor reached the scene-cut stage")
  }

  test("multimodal decode meta matches spark-side recomputation") {
    val meta = graft.multimodal.Multimodal
      .decodeMeta(spark, Tables.documents(spark, sf0001))
    val rows = meta.collect()
    assert(rows.length == 500)
    rows.take(20).foreach { m =>
      assert(m.width == m.n_bytes % 640 + 1)
      assert(m.height == (m.n_bytes * 31) % 480 + 1)
      assert(m.header_hex.length == math.min(8, m.n_bytes) * 2)
    }
  }

  test("MediaDecoder: strict PNM decodes real dims/format/frames; others keep the fake arithmetic") {
    import graft.multimodal.Multimodal.MediaDecoder
    // P5 filmstrip: h = 3·w ⇒ 3 stacked frames by the filmstrip rule
    val w = 8; val h = 24
    val strip = s"P5 $w $h 255\n".getBytes("ISO-8859-1") ++
      Array.tabulate(w * h)(i => (i % 251).toByte)
    val m = MediaDecoder.decode(7L, strip)
    assert(m.width == w && m.height == h && m.n_frames == 3 &&
      m.format == "pnm/p5", s"filmstrip decode: $m")
    assert(m.n_bytes == strip.length)
    assert(m.header_hex == strip.take(8).map(b => f"$b%02X").mkString)
    // P6 still (square): 1 frame, RGB format tag
    val sq = s"P6 4 4 255\n".getBytes("ISO-8859-1") ++ new Array[Byte](48)
    val m6 = MediaDecoder.decode(8L, sq)
    assert(m6.width == 4 && m6.height == 4 && m6.n_frames == 1 &&
      m6.format == "pnm/p6", s"P6 still decode: $m6")
    // non-multiple height: a still, not a strip
    val odd = s"P5 4 7 255\n".getBytes("ISO-8859-1") ++ new Array[Byte](28)
    assert(MediaDecoder.decode(9L, odd).n_frames == 1)
    // corrupt magic falls back to the documented fake arithmetic
    val bad = strip.clone(); bad(1) = '9'.toByte
    val mf = MediaDecoder.decode(10L, bad)
    val n = bad.length
    assert(mf.format == "fake/raw" && mf.width == n % 640 + 1 &&
      mf.height == (n * 31) % 480 + 1 && mf.n_frames == n % 10 + 1)
  }

  test("pnmAugmentedPayloads: planted renditions conform and parse back to the planted dims") {
    import graft.functions.PHash64
    import graft.multimodal.Multimodal
    val aug = Multimodal.queries("mm_decode_meta")(spark, sf0001)
    val planted = aug.filter(col("doc_id") >= Multimodal.PnmOffset)
      .collect()
    assert(planted.nonEmpty, "no planted PNM renditions at sf0.001")
    planted.foreach { r =>
      val origId = r.getLong(0) - Multimodal.PnmOffset
      val w = (origId % 13 + 4).toInt
      val k = (origId % 3 + 1).toInt
      assert(r.getInt(2) == w, s"width ${r.getInt(2)} != planted $w")
      assert(r.getInt(3) == w * k, "height != planted w*k")
      assert(r.getInt(4) == k, s"n_frames ${r.getInt(4)} != planted $k")
      // two planted families (round 14): P5 at %16==3, P6 at %16==11
      assert(r.getString(5) ==
        (if (origId % 16 == 3) "pnm/p5" else "pnm/p6"),
        s"format ${r.getString(5)} for orig id $origId")
    }
    assert(planted.exists(_.getString(5) == "pnm/p6"),
      "no planted P6 renditions — the 3-channel decode path is unchecked")
    // meanwhile the TEXT-rendition corpus the tiled phash oracles read
    // must stay PNM-free (Verify checks this per dump; pin it here too)
    val raw = graft.multimodal.Multimodal
      .phashOracleCorpus(spark, sf0001)
      .select("payload").as[Array[Byte]].collect()
    assert(raw.forall(b => !PHash64.conforms(b)),
      "phash oracle corpus must stay PNM-free (tiled-model invariant)")
    // originals in the decode corpus keep the fake path: same row count
    // as the raw table plus one rendition per non-empty %16==3 (P5)
    // and %16==11 (P6) doc
    val docs = Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val nExpectedPlanted = docs
      .filter((col("doc_id") % 16 === 3 || col("doc_id") % 16 === 11) &&
        col("text").isNotNull && length(col("text")) > 0).count()
    assert(aug.count() == nDocs + nExpectedPlanted)
    assert(planted.length.toLong == nExpectedPlanted)
  }

  test("mm_frame_sample and mm_scene_cut: planted filmstrips contribute their REAL frame counts") {
    import graft.multimodal.Multimodal
    val frames = Multimodal.queries("mm_frame_sample")(spark, sf0001)
      .filter(col("doc_id") >= Multimodal.PnmOffset)
      .groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (id, n) =>
      val k = (id - Multimodal.PnmOffset) % 3 + 1
      assert(n == k, s"doc $id sampled $n frames, planted $k")
    }
    val cuts = Multimodal.queries("mm_scene_cut")(spark, sf0001)
      .filter(col("doc_id") >= Multimodal.PnmOffset)
      .select(col("doc_id"), col("n_frames")).as[(Long, Long)].collect()
    assert(cuts.nonEmpty)
    cuts.foreach { case (id, n) =>
      assert(n == (id - Multimodal.PnmOffset) % 3 + 1,
        s"scene-cut frame count for $id")
    }
  }

  test("hashBand: a filmstrip frame hashes exactly as the standalone image; P6 gray collapses to the P5 hash") {
    import graft.functions.PHash64
    val w = 16
    def frame(seed: Int) = Array.tabulate(w * w) { i =>
      val x = i % w; val y = i / w
      ((x * 7 + y * 11 + seed * (x * y + 3)) % 256).toByte
    }
    val f1 = frame(1); val f2 = frame(5)
    val strip = s"P5 $w ${2 * w} 255\n".getBytes("ISO-8859-1") ++ f1 ++ f2
    val off = strip.length - 2 * w * w
    // band hash == the same pixels hashed as a standalone conforming
    // image — the per-frame path shares the whole-image arithmetic
    val img1 = s"P5 $w $w 255\n".getBytes("ISO-8859-1") ++ f1
    val img2 = s"P5 $w $w 255\n".getBytes("ISO-8859-1") ++ f2
    assert(PHash64.hashBand(strip, off, w, w, 1) == PHash64.hash(img1))
    assert(PHash64.hashBand(strip, off + w * w, w, w, 1) ==
      PHash64.hash(img2))
    // P6 with R=G=B=v: ITU-R 601 integer luma (299+587+114 = 1000)
    // reproduces v exactly, so the 3-channel band equals the P5 hash
    val rgb = f1.flatMap(b => Array(b, b, b))
    val p6 = s"P6 $w $w 255\n".getBytes("ISO-8859-1") ++ rgb
    assert(PHash64.hashBand(p6, p6.length - 3 * w * w, w, w, 3) ==
      PHash64.hash(img1))
  }

  test("scene cut on perceptual frame hashes: near-identical frames are no cut, a content change is exactly one") {
    import graft.functions.PHash64
    import graft.multimodal.Multimodal
    val w = 16
    // textured gradient; `invert` flips the content (a genuine scene
    // change: every AC coefficient negates, flipping ~half the sign
    // bits); `tweak` nudges ONE pixel by one code (a near-identical
    // frame: the perceptual hash must stay within the 10-bit radius)
    def grad(invert: Boolean, tweak: Boolean) = Array.tabulate(w * w) { i =>
      val x = i % w; val y = i / w
      val v0 = (x * 16 + y * 3) % 256
      val v = if (invert) 255 - v0 else v0
      (if (tweak && i == 0) { if (v == 255) 254 else v + 1 } else v).toByte
    }
    val strip = s"P5 $w ${4 * w} 255\n".getBytes("ISO-8859-1") ++
      grad(false, false) ++ grad(false, true) ++
      grad(true, false) ++ grad(true, true)
    val payloads = Seq((1L, strip)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFramesFromPayloads(payloads)
    val sigs = frames.orderBy("frame_idx")
      .select("frame_sig").as[String].collect()
    assert(sigs.length == 4)
    assert(sigs.forall(_.length == 16), "perceptual sigs are hex16")
    // the sigs really are hashBand's integers
    assert(sigs(0) ==
      f"${PHash64.hashBand(strip, strip.length - 4 * w * w, w, w, 1)}%016x")
    val cuts = Multimodal.sceneCutsFromFrames(frames)
      .select("n_frames", "n_cuts", "first_cut_idx")
      .as[(Long, Long, Long)].collect()
    assert(cuts.toSeq == Seq((4L, 1L, 3L)),
      s"expected exactly one cut at frame 3 (the inversion), got ${cuts.toSeq} — sigs $sigs")
  }

  test("mm_resize: conforming payloads emit the REAL resampled pixels' signature; opaque keeps the stand-in") {
    import graft.multimodal.Multimodal
    // 2×2 P5 resampled into the 64×64 box fit = four 32×32 quadrants
    val px = Array[Byte](10, 20, 30, 40)
    val img = "P5 2 2 255\n".getBytes("ISO-8859-1") ++ px
    val opaque = "just some text".getBytes("ISO-8859-1")
    val payloads = Seq((1L, img), (2L, opaque)).toDF("doc_id", "payload")
    val out = Multimodal.resizeToBoxFromPayloads(spark, payloads)
      .collect().map(r => r.doc_id -> r).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // independently-computed expected output bytes (nearest neighbor)
    val expectedHex = (0 until 64).flatMap { y =>
      (0 until 64).map { x =>
        f"${px((y * 2 / 64) * 2 + (x * 2 / 64)) & 0xff}%02x"
      }
    }.mkString
    assert(out(1L).out_w == 64 && out(1L).out_h == 64)
    assert(out(1L).resized_sig == md5hex(expectedHex),
      "conforming payload must sign the genuinely resampled pixels")
    // opaque: fake-dims box fit + the documented md5(id:box) stand-in
    val n = opaque.length
    val w0 = n % 640 + 1; val h0 = (n * 31) % 480 + 1
    val (ow, oh) =
      if (w0 >= h0) (64, math.max(1, h0 * 64 / w0))
      else (math.max(1, w0 * 64 / h0), 64)
    assert(out(2L).out_w == ow && out(2L).out_h == oh)
    assert(out(2L).resized_sig == md5hex(s"2:$ow:$oh"))
  }

  test("mm_features: conforming payloads emit real decoded statistics; opaque keeps byte stats") {
    import graft.multimodal.Multimodal
    val w = 4
    val pix = Array.tabulate(w * w * 2)(i => (i * 7 % 256).toByte)
    val strip = s"P5 $w ${2 * w} 255\n".getBytes("ISO-8859-1") ++ pix
    // single-pixel P6: per-pixel integer luma floor (299·10+587·20+114·30)//1000
    val p6 = "P6 1 1 255\n".getBytes("ISO-8859-1") ++ Array[Byte](10, 20, 30)
    val opaque = "hello world!!".getBytes("ISO-8859-1")
    val out = Multimodal.extractFeaturesFromPayloads(
      Seq((1L, strip), (2L, opaque), (3L, p6)).toDF("doc_id", "payload"))
      .as[(Long, Seq[Float])].collect().toMap
    val meanLuma = pix.map(_ & 0xff).sum / (w * 2 * w)
    assert(out(1L) == Seq(4f, 8f, 2f, meanLuma.toFloat),
      s"real stats for the filmstrip: ${out(1L)}")
    assert(out(3L) == Seq(1f, 1f, 1f, 18f), s"P6 luma floor: ${out(3L)}")
    val n = opaque.length
    assert(out(2L) == Seq(n.toFloat, (n % 251).toFloat,
      (n % 63).toFloat, (n % 17).toFloat))
  }

  test("augmentedDocs: perturbed-rendition population is non-empty on the fixtures (generator property, not a pinned id)") {
    import graft.multimodal.Multimodal
    // the one-byte perturbation only plants when the leading byte is
    // printable ASCII; this pins that the REAL fixtures (and thus the
    // lightly-edited pair population the phash oracle row exercises)
    // can't silently lose the family to a regenerated corpus
    Seq(sf0001, sf001).foreach { dir =>
      val aug = Multimodal.phashOracleCorpus(spark, dir)
      val nPerturbed = aug
        .filter(col("doc_id") >= Multimodal.PerturbOffset &&
          col("doc_id") < Multimodal.PnmOffset).count()
      assert(nPerturbed > 0, s"no perturbed renditions planted at $dir")
      val nDoubled = aug
        .filter(col("doc_id") >= Multimodal.ReencodeOffset &&
          col("doc_id") < Multimodal.PerturbOffset).count()
      assert(nDoubled > 0, s"no doubled renditions planted at $dir")
    }
  }

  /** All (doc_a<doc_b, dist≤3) pairs over 40-char lower prefixes, the slow
    * way — the recall yardstick for the PassJoin candidate scheme. (No
    * |Δlen| pre-filter needed: levenshtein ≥ |Δlen| already implies it.) */
  private def bruteEditPairs(dir: String): Set[(Long, Long, Int)] = {
    val p = Tables.documents(spark, dir).select(col("doc_id"),
      lower(substring(col("text"), 1, 40)).as("pre"))
    p.toDF("doc_a", "pre_a").join(p.toDF("doc_b", "pre_b"),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pre_a"), col("pre_b")).as("dist"))
      .filter(col("dist") <= 3).as[(Long, Long, Int)].collect().toSet
  }

  test("dedup_snm: planted sort-adjacent near-dups; fixture pairs within passjoin's exact set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snm").toString
    val base = "the quick brown fox jumps over dog"
    Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")), // ed 1 — sorts adjacent
      (3L, "zzz completely elsewhere in the sort order"),
      (4L, base),                           // exact duplicate
      (5L, base.replace("dog", "cat")))     // ed 3; ed 4 vs doc 2
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_snm")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 4L), (1L, 5L), (2L, 4L), (4L, 5L)),
      s"got $out")

    // fixture: every SNM pair is a true ed<=3 prefix pair (the passjoin
    // has provable exact recall for the same predicate, so SNM — a
    // single-pass candidate heuristic — must land inside it), and the
    // single pass already finds real pairs
    val snm = DedupQueries.queries("dedup_snm")(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    val exact = DedupQueries.queries("dedup_editdist_passjoin")(spark, sf0001)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSet
    assert(snm.nonEmpty)
    assert(snm.subsetOf(exact),
      s"SNM invented pairs: ${snm.diff(exact).take(5)}")
  }

  test("dedup_snm: non-ASCII prefixes rank in exact UTF-8 byte order (key never overflows)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snm-utf8").toString
    // 'á' (U+00E1) leads with UTF-8 bytes C3 A1. A codepoint-based sort
    // key would put 225 in the top byte slot (225·2⁵⁶ > Long.Max) and
    // wrap NEGATIVE, ranking accented docs FIRST; exact byte order ranks
    // them after all ASCII. Ten middle docs separate "zzz…"/"ázz…" by
    // more than w=8 under the wrong order, so the planted ed-1 pair
    // (1,2) is found only when ranks follow exact byte order. The CJK
    // pair stresses the clamp-free multi-byte path (U+4E2D → E4 B8 AD).
    val mid = (3L to 12L).map(i => (i, s"mmm middle padding document $i"))
    val docs = Seq(
      (1L, "zzz abcdefgh shared tail"),
      (2L, "ázz abcdefgh shared tail"), // ed 1 vs doc 1
      (13L, "中文前缀 cjk document one"),
      (14L, "中文前缀 cjk document two")) ++ mid // ed 3 within the pair
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_snm")(spark, dir)
      .as[(Long, Long)].collect().toSet

    // plain-Scala replay of the oracle: rank by (UTF-8 bytes of the
    // lowered 40-char prefix, doc_id) — the same binary collation DuckDB
    // and Spark's UTF8String use — window w=8, codepoint ed ≤ 3
    def cmpBytes(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    def lev(a: String, b: String): Int = {
      val x = a.codePoints.toArray; val y = b.codePoints.toArray
      val dp = Array.tabulate(y.length + 1)(identity)
      for (xi <- 1 to x.length) {
        var diag = dp(0); dp(0) = xi
        for (yj <- 1 to y.length) {
          val t = dp(yj)
          dp(yj) = math.min(math.min(dp(yj) + 1, dp(yj - 1) + 1),
            diag + (if (x(xi - 1) == y(yj - 1)) 0 else 1))
          diag = t
        }
      }
      dp(y.length)
    }
    val pres = docs.map { case (id, t) => (id, t.toLowerCase.take(40)) }
    val ranked = pres.sortWith { case ((ia, pa), (ib, pb)) =>
      val c = cmpBytes(pa, pb); if (c != 0) c < 0 else ia < ib }
    val expected = (for {
      i <- ranked.indices; o <- 1 to 8 if i + o < ranked.size
      if lev(ranked(i)._2, ranked(i + o)._2) <= 3
    } yield {
      val (x, y) = (ranked(i)._1, ranked(i + o)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    assert(expected.contains((1L, 2L)),
      "fixture must plant the ASCII/accented adjacent pair")
    assert(expected.contains((13L, 14L)),
      "fixture must plant the CJK adjacent pair")
    assert(out == expected,
      s"missing=${expected.diff(out)} invented=${out.diff(expected)}")
  }

  test("dedup_editdist_passjoin: planted edit types found; equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-passjoin").toString
    // short enough that base and its 3-char-inserted variant BOTH fit
    // inside the 40-char prefix window (else truncation shifts the tail
    // out and the planted distance changes)
    val base = "the quick brown fox jumps over dog"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")), // 1 substitution inside the prefix
      (3L, "xx " + base),                   // 3 insertions at the front
      (4L, base.drop(4)),                   // 4 deletions -> excluded vs 1
      (5L, "completely unrelated content that matches nothing else at all"),
      (6L, "ab"), (7L, "abc"),              // short strings: fallback path
      (8L, base))                           // exact duplicate of 1
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_editdist_passjoin")(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == bruteEditPairs(dir), "planted corpus: PassJoin != brute force")
    val pairSet = out.map(t => (t._1, t._2))
    assert(pairSet.contains((1L, 2L)) && pairSet.contains((1L, 3L)) &&
      pairSet.contains((6L, 7L)) && pairSet.contains((1L, 8L)))
    assert(out.contains((1L, 8L, 0)) && out.contains((6L, 7L, 1)))
    assert(!pairSet.contains((1L, 4L)) && !pairSet.contains((1L, 5L)))
    // and on the real fixture: candidate pruning loses nothing
    val fx = DedupQueries.queries("dedup_editdist_passjoin")(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    assert(fx == bruteEditPairs(sf0001), "fixture: PassJoin != brute force")
    assert(fx.nonEmpty)
  }

  test("dedup_editdist_passjoin: randomized edit scripts never escape the candidates") {
    // seeded property sweep: corpora of random strings plus variants at
    // random edit scripts (0-4 ops, mixed ins/del/sub at random
    // positions) — the query must equal brute force on every corpus,
    // i.e. the segment-signature candidates catch every planted script
    // with ed <= 3 and the verify rejects every one beyond it
    val rnd = new scala.util.Random(4242)
    val alpha = "abcdefgh"
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def edit(sIn: String): String = {
      val sb = new StringBuilder(sIn)
      rnd.nextInt(3) match {
        case 0 if sb.nonEmpty => sb.deleteCharAt(rnd.nextInt(sb.length))
        case 1 => sb.insert(rnd.nextInt(sb.length + 1),
          alpha(rnd.nextInt(alpha.length)))
        case _ if sb.nonEmpty =>
          sb.setCharAt(rnd.nextInt(sb.length), alpha(rnd.nextInt(alpha.length)))
        case _ => sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      sb.toString
    }
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-pjprop$round").toString
      val docs = (0 until 12).flatMap { i =>
        val base = randStr(8 + rnd.nextInt(30)) // spans the tiny-class edge
        val nEdits = rnd.nextInt(5)             // 0..4: includes beyond-K
        val variant = (1 to nEdits).foldLeft(base)((s, _) => edit(s))
        Seq((i * 2L, base), (i * 2L + 1L, variant))
      }
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = DedupQueries.queries("dedup_editdist_passjoin")(spark, dir)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteEditPairs(dir), s"round $round diverged")
    }
  }

  test("dedup_containment: a quoted excerpt flags directionally where jaccard is blind") {
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val container = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "delta epsilon zeta eta theta iota" // every shingle ⊂ container
    Seq((1L, container), (2L, excerpt),
      (3L, "unrelated totally different words here entirely now"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = DedupQueries.queries("dedup_containment")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    // excerpt contained in container at exactly 100% — and ONLY that
    // direction (the container is nowhere near contained in the excerpt)
    assert(out == Set((2L, 1L, 10000L)), s"got $out")
    // the prefix-filtered twin is output-identical by construction —
    // including on the asymmetric case the prefix rule exists for (the
    // excerpt's prefix probes the container's FULL set; the container's
    // prefix proves nothing and is not relied on)
    val pref = DedupQueries.queries("dedup_containment_prefix")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(pref == out, s"prefix twin diverged: $pref vs $out")
    // jaccard is structurally blind to this pair: 4 shared shingles over
    // 18 union ⇒ far below any dedup threshold
    val jac = DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)) && !jac.contains((2L, 1L)))
  }

  test("dedup_containment_prefix == dedup_containment on the corpus fixtures") {
    for (dir <- Seq(sf0001, sf001)) {
      val direct = DedupQueries.queries("dedup_containment")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      val pref = DedupQueries.queries("dedup_containment_prefix")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      assert(pref == direct,
        s"$dir: prefix ${pref.size} pairs vs direct ${direct.size}; " +
          s"missing=${(direct -- pref).take(3)} extra=${(pref -- direct).take(3)}")
      assert(direct.nonEmpty || dir == sf0001) // sf0.01 has containment pairs
    }
  }

  test("sim_rerank_truncated: plain-Scala two-stage replay matches exactly") {
    val all = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, e) => id -> e.map(_.toDouble) }
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val probes = all.filter(_._1 < 8)
    val corpus = all.filter(_._1 >= 8)
    val expected = probes.flatMap { case (qid, qv) =>
      val q16 = qv.take(16)
      val top40 = corpus
        .map { case (cid, cv) => (cid, cv, dot(cv.take(16), q16)) }
        .sortBy { case (cid, _, s) => (-s, cid) }.take(40)
      top40
        .map { case (cid, cv, _) =>
          (cid, dot(cv, qv) / math.sqrt(dot(cv, cv) * dot(qv, qv))) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5)
        .zipWithIndex.map { case ((cid, _), i) => (qid, cid, i + 1) }
    }.toSet
    val out = SimilarityQueries.queries("sim_rerank_truncated")(spark, sf0001)
      .select(col("qid"), col("cid"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(out == expected)
    assert(out.size == probes.length * 5)
  }

  test("mm_scene_cut: plain-Scala frame-delta replay matches exactly") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val thr = 1431655765L
    // independent replay of the corpus: fixture docs (fake n_frames +
    // md5(id#i) sigs, abs-delta metric) plus BOTH planted PNM filmstrip
    // families (P5 %16==3, P6 %16==11 — round 14), whose REAL path
    // yields k frames, per-frame PERCEPTUAL hashes (hex16), and the
    // hamming > 10 cut metric. Band bytes are rebuilt from the planting
    // formula independently; hashBand itself is pinned by its own spec
    // and the DuckDB oracle replay.
    val corpus: Seq[(Long, Seq[String])] = docs.map { case (id, text) =>
      val n = text.getBytes("UTF-8").length % 10 + 1
      (id, (1 to n).map(i => md5hex(s"$id#$i")))
    }.toSeq ++ docs.collect {
      case (id, text) if (id % 16 == 3 || id % 16 == 11) && text.nonEmpty =>
        val ch = if (id % 16 == 3) 1 else 3
        val rep = if (ch == 1) 48 else 144
        val w = (id % 13 + 4).toInt
        val k = (id % 3 + 1).toInt
        val nbytes = w * w * k * ch
        val pixhex = (md5hex(text) * rep).substring(0, nbytes * 2)
        val pix = pixhex.grouped(2)
          .map(Integer.parseInt(_, 16).toByte).toArray
        val fb = w * w * ch
        val sigs = (1 to k).map { i =>
          f"${graft.functions.PHash64.hashBand(pix, (i - 1) * fb, w, w, ch)}%016x"
        }
        (id + graft.multimodal.Multimodal.PnmOffset, sigs)
    }
    val expected = corpus.map { case (id, sigs) =>
      val cuts =
        if (sigs.head.length == 16) {
          // perceptual path: hamming distance between consecutive hashes
          val hs = sigs.map(java.lang.Long.parseLong(_, 16))
          hs.zip(hs.drop(1)).zipWithIndex.collect {
            case ((p, f), i) if java.lang.Long.bitCount(p ^ f) > 10 => i + 2
          }
        } else {
          val feats = sigs.map(s =>
            java.lang.Long.parseLong(s.substring(0, 8), 16))
          feats.zip(feats.drop(1)).zipWithIndex.collect {
            case ((p, f), i) if math.abs(f - p) > thr => i + 2
          }
        }
      id -> ((sigs.length.toLong, cuts.length.toLong,
        cuts.headOption.map(_.toLong).getOrElse(-1L)))
    }.toMap
    val out = graft.multimodal.Multimodal.queries("mm_scene_cut")(spark, sf0001)
      .collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_frames"),
          r.getAs[Long]("n_cuts"),
          Option(r.getAs[Any]("first_cut_idx"))
            .map(_.toString.toLong).getOrElse(-1L)))
      }.toMap
    assert(out == expected,
      s"diff=${out.toSet.diff(expected.toSet).take(3)}")
    // the 2/3 threshold cuts densely on uniform fake features — both
    // branches are exercised corpus-wide
    assert(out.values.exists(_._2 > 0) && out.values.exists(_._2 == 0))
  }

  test("sim_maxsim: plain-Scala late-interaction replay matches exactly") {
    val all = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, e) => id -> e.map(_.toDouble) }
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def subs(v: Seq[Double]): Seq[Seq[Double]] =
      (0 until 4).map(i => v.slice(16 * i, 16 * (i + 1)))
    def maxsim(q: Seq[Double], c: Seq[Double]): Double = {
      val cs = subs(c)
      // same association order as the query expression: Σ_i max_j ⟨qᵢ,cⱼ⟩
      subs(q).map(qi => cs.map(cj => dot(qi, cj)).max).reduce(_ + _)
    }
    val queries = all.filter(_._1 < 4)
    val corpus = all.filter(_._1 >= 4)
    val expected = queries.flatMap { case (qid, qv) =>
      corpus.map { case (cid, cv) => (cid, maxsim(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5)
        .zipWithIndex.map { case ((cid, s), i) => (qid, cid, i + 1, s) }
    }.toSet
    val out = SimilarityQueries.queries("sim_maxsim")(spark, sf0001)
      .select(col("qid"), col("cid"), col("rank"), col("maxsim"))
      .as[(Long, Long, Int, Double)].collect()
    assert(out.map { case (q, c, r, _) => (q, c, r) }.toSet ==
      expected.map { case (q, c, r, _) => (q, c, r) })
    // scores agree to the published rounding
    val expScore = expected.map { case (q, c, _, s) => (q, c) -> s }.toMap
    out.foreach { case (q, c, _, s) =>
      assert(math.abs(s - expScore((q, c))) < 1e-6, s"($q,$c)")
    }
    assert(out.length == queries.length * 5)
    // MaxSim dominates the pooled single-vector dot of the same pair:
    // Σ_i max_j ⟨qᵢ,cⱼ⟩ ≥ Σ_i ⟨qᵢ,cᵢ⟩ = ⟨q,c⟩
    queries.take(2).foreach { case (_, qv) =>
      corpus.take(50).foreach { case (_, cv) =>
        assert(maxsim(qv, cv) >= dot(qv, cv) - 1e-12)
      }
    }
  }
}
