package graft

import graft.queries.{CurationQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Invariants for the round-3 curation operators (exact values are
  * oracle-checked by the driver; these pin semantic properties, parity
  * between twin implementations, and behavior the fixture can't reach). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontam_bloom == decontam_overlap exactly (no false negatives)") {
    val bloom = CurationQueries.queries("decontam_bloom")(spark, sf001)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toSet
    val plain = PipelineQueries.queries("decontam_overlap")(spark, sf001)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toSet
    assert(bloom == plain)
  }

  test("decontam_minhash == brute-force cross-set jaccard (banding loses nothing)") {
    // reference: exact jaccard for EVERY corpus×bench pair sharing a
    // shingle — no banding, no candidate restriction. The minhash query
    // must reproduce it exactly: banding at 16×4 has no false negatives
    // at the fixture's match levels and the verify join kills the rest.
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf0001)
    val idx = docs.select(col("doc_id"), col("source"),
      explode(shingles(col("text"), 3)).as("s"))
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = idx.filter(col("source") =!= "src0").toDF("doc_id", "sa", "s")
      .join(idx.filter(col("source") === "src0")
        .select(col("doc_id").as("bench_id"), col("s")), "s")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("i"))
      .join(sizes.toDF("doc_id", "na"), "doc_id")
      .join(sizes.toDF("bench_id", "nb"), "bench_id")
      .withColumn("j", col("i").cast("double") /
        (col("na") + col("nb") - col("i")))
      .filter(col("j") >= 0.8)
      .select(col("doc_id"), col("bench_id"), round(col("j"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val banded = CurationQueries.queries("decontam_minhash")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty) // the fixture must exercise the operator
    assert(banded == brute)
  }

  test("bloom predicate prunes: no false negatives, real rejections") {
    // evaluate the ACTUAL probe predicate (not just the fixture shape):
    // survivors must contain every true hit (no false negatives) and
    // reject a meaningful share of the rest (not a pass-through)
    import graft.functions.TextFunctions._
    import graft.functions.BloomFilterAggregator
    val docs = Tables.documents(spark, sf0001)
    val corpusShingles = docs.filter(col("source") =!= "src0")
      .select(explode(shingles(col("text"), 3)).as("s"))
    val bench = docs.filter(col("source") === "src0")
      .select(explode(shingles(col("text"), 3)).as("s"))
    val bloomAgg = udaf(BloomFilterAggregator)
    val bits = bench.select(bloomAgg(
      CurationQueries.bloomPos(0, col("s")),
      CurationQueries.bloomPos(1, col("s")),
      CurationQueries.bloomPos(2, col("s"))).as("b"))
      .head.getSeq[Long](0)
    val bitsLit = typedlit(bits)
    val survivors = corpusShingles.filter(Seq(0, 1, 2)
      .map(i => CurationQueries.mightContain(bitsLit,
        CurationQueries.bloomPos(i, col("s")))).reduce(_ && _)).count()
    val total = corpusShingles.count()
    val trueHits = corpusShingles
      .join(bench.distinct(), Seq("s"), "left_semi").count()
    assert(trueHits < total, "fixture must contain non-benchmark shingles")
    assert(survivors >= trueHits, "bloom must never reject a true hit")
    assert(survivors < total,
      s"bloom rejected nothing (survivors=$survivors total=$total)")
  }

  test("dedup_substr_seen: planted copy scores 10000 bp, originals score low") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words one two three four five"),
      // doc 3 = exact copy of doc 1 -> every 5-gram already seen
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    import graft.functions.TextFunctions._
    val idx = docs.select(col("doc_id"),
      explode(shingles(col("text"), 5)).as("s"))
    val out = idx
      .withColumn("fo", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("fo") < col("doc_id"), 1L).otherwise(0L)).as("seen"))
      .select(col("doc_id"),
        floor(col("seen").cast("double") * 10000 / col("n")).as("bp"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 0L)
    assert(out(3L) == 10000L)
  }

  test("q55_decile_bucket matches single-window ntile on the fixture") {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val expected = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .as[(Int, Long, Long, Long)].collect().toSet
    val got = CurationQueries.queries("q55_decile_bucket")(spark, sf001)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("q55_decile_bucket: exactly 10 deciles, sizes differ by at most 1") {
    val sizes = CurationQueries.queries("q55_decile_bucket")(spark, sf001)
      .select("n_docs").as[Long].collect()
    assert(sizes.length == 10)
    assert(sizes.max - sizes.min <= 1)
  }

  test("mix_sources_target: kept counts track the target weights") {
    val kept = CurationQueries.queries("mix_sources_target")(spark, sf001)
      .groupBy("source").count()
      .withColumn("wt",
        pmod(substring(col("source"), 4, 10).cast("int"), lit(4)) + 1)
      .as[(String, Long, Int)].collect()
    // per unit of weight the kept count should be roughly constant
    // (hash sampling is binomial; fixture shards are 25 docs each)
    val perUnit = kept.map { case (_, n, w) => n.toDouble / w }
    assert(perUnit.max <= perUnit.min * 2.5,
      s"kept/weight spread too wide: ${kept.mkString(",")}")
    // every source with weight w keeps at most its shard size
    assert(kept.forall(_._2 <= 25))
  }

  test("ta_pii_scrub redacts planted PII and counts hits") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 192.168.0.1 now"),
      (2L, "ssn 123-45-6789 twice 987-65-4321 end"),
      (3L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit(CurationQueries.EmailRe), lit("<EMAIL>")),
          lit(CurationQueries.SsnRe), lit("<SSN>")),
          lit(CurationQueries.Ipv4Re), lit("<IP>")).as("scrubbed"),
        regexp_count(col("text"), lit(CurationQueries.EmailRe)).as("n_email"),
        regexp_count(col("text"), lit(CurationQueries.SsnRe)).as("n_ssn"),
        regexp_count(col("text"), lit(CurationQueries.Ipv4Re)).as("n_ip"))
    val rows = df.as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._2 == "contact <EMAIL> or <IP> now")
    assert(rows(1L)._3 == 1 && rows(1L)._5 == 1)
    assert(rows(2L)._2 == "ssn <SSN> twice <SSN> end")
    assert(rows(2L)._4 == 2)
    assert(rows(3L)._2 == "clean text with no pii at all")
    assert(rows(3L)._3 == 0 && rows(3L)._4 == 0 && rows(3L)._5 == 0)
  }

  test("ta_pii_scrub on the fixture is an exact pass-through") {
    val changed = CurationQueries.queries("ta_pii_scrub")(spark, sf0001)
      .join(Tables.documents(spark, sf0001), "doc_id")
      .filter(col("scrubbed") =!= col("text")).count()
    assert(changed == 0L)
  }

  test("sketch_hll_union: estimates within 5% of exact distinct counts") {
    import graft.functions.TextFunctions._
    val toks = Tables.documents(spark, sf001)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
    val exactPerLang = toks.groupBy("lang")
      .agg(countDistinct("t").as("n")).as[(String, Long)].collect().toMap
    val exactAll = toks.select("t").distinct().count()
    val est = CurationQueries.queries("sketch_hll_union")(spark, sf001)
      .as[(String, Long)].collect().toMap
    for ((lang, n) <- exactPerLang) {
      val e = est(lang)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$lang: est $e vs exact $n")
    }
    assert(math.abs(est("*all*") - exactAll) <=
      math.max(1L, (exactAll * 0.05).toLong))
  }

  test("sketch union ≡ sketch of union (mergeability)") {
    import graft.functions.TextFunctions._
    val toks = Tables.documents(spark, sf001)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
    val direct = toks.agg(
      hll_sketch_estimate(hll_sketch_agg(col("t"))).as("n"))
      .as[Long].head()
    val viaUnion = CurationQueries.queries("sketch_hll_union")(spark, sf001)
      .filter(col("lang") === "*all*").select("est_distinct")
      .as[Long].head()
    assert(direct == viaUnion)
  }

  test("ta_bpe_merges: top-20 by count desc, winner = independent max") {
    import graft.functions.TextFunctions._
    val counts = Tables.documents(spark, sf0001)
      .select(posexplode(tokens(col("text"))).as(Seq("p", "t")),
        col("doc_id"))
      .withColumn("nxt", lead(col("t"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("p")))
      .filter(col("nxt").isNotNull)
      .select(concat_ws(" ", col("t"), col("nxt")).as("pair"))
      .groupBy("pair").count()
      .as[(String, Long)].collect().toMap
    val out = CurationQueries.queries("ta_bpe_merges")(spark, sf0001)
      .as[(String, Long)].collect()
    assert(out.length == 20)
    // non-increasing counts, and each reported count matches the
    // independent window-based recomputation
    assert(out.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
    out.foreach { case (p, c) => assert(counts(p) == c, p) }
    assert(out.head._2 == counts.values.max)
  }

  test("ta_boilerplate: rewrite is a token-subsequence with exact accounting") {
    import graft.functions.TextFunctions._
    val orig = Tables.documents(spark, sf0001)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    val out = CurationQueries.queries("ta_boilerplate")(spark, sf0001)
      .as[(Long, String, Long)].collect()
    assert(out.length == orig.size)
    var removedSomething = false
    var keptEverything = false
    for ((id, clean, nRemoved) <- out) {
      val w = orig(id)
      val kept = clean.split(" ").filter(_.nonEmpty).toSeq
      assert(kept.size + nRemoved == w.size,
        s"doc $id: kept ${kept.size} + removed $nRemoved != ${w.size}")
      // order-preserving subsequence: each kept token consumes the
      // earliest unused matching position of the original
      var i = 0
      for (t <- kept) {
        i = w.indexOf(t, i)
        assert(i >= 0, s"doc $id: '$t' breaks the subsequence")
        i += 1
      }
      if (nRemoved > 0) removedSomething = true
      if (nRemoved == 0) keptEverything = true
    }
    assert(removedSomething, "fixture should contain boilerplate spans")
    assert(keptEverything, "fixture should contain untouched docs")
  }

  test("pipeline_e2e: stage flags are consistent and the gate composes") {
    val rows = CurationQueries.queries("pipeline_e2e")(spark, sf0001)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.length == 500)
    for ((id, pq, exactDup, nearDup, survives) <- rows) {
      // dedup stages only ever see quality passers
      assert(!exactDup || pq, s"doc $id: exact_dup without passed_quality")
      // near-dup clustering only ever sees exact canonicals
      assert(!nearDup || (pq && !exactDup),
        s"doc $id: near_dup outside stage-3 input")
      assert(survives == (pq && !exactDup && !nearDup), s"doc $id")
    }
    val n = rows.count(_._5)
    assert(n > 0 && n < rows.length,
      s"survivor count $n should be non-degenerate")
  }

  test("sample_epochs: integer schedule arithmetic is exact") {
    val rows = CurationQueries.queries("sample_epochs")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val nsrc = rows.length
    for ((src, nDocs, avail, target, epochs, overuseBp) <- rows) {
      assert(nDocs > 0 && avail > 0, src)
      assert(target == 2 * total / nsrc, src)
      assert(epochs == (target + avail - 1) / avail, src)
      assert(overuseBp == target * 10000 / avail, src)
      // budget is 2x the corpus split evenly: every shard of a uniform
      // fixture should need ~2 epochs
      assert(epochs >= 1, src)
    }
    // the uniform split loses at most nsrc-1 tokens to integer division
    assert(2 * total - rows.map(_._4).sum < nsrc)
  }
  test("curate_shuffle: a stable seeded bijection, not doc_id order") {
    val run1 = SparkEntry.queries("curate_shuffle")(spark, sf0001)
      .as[(Long, Long)].collect()
    val run2 = SparkEntry.queries("curate_shuffle")(spark, sf0001)
      .as[(Long, Long)].collect()
    // reproducible: byte-for-byte identical across independent runs
    assert(run1.sortBy(_._1).toSeq == run2.sortBy(_._1).toSeq)
    // a bijection onto 1..N
    val n = Tables.documents(spark, sf0001).count()
    assert(run1.length == n)
    assert(run1.map(_._2).sorted.toSeq == (1L to n).toSeq)
    // and genuinely shuffled: position order != doc_id order (md5 makes
    // a coincidental identity on 500 docs astronomically unlikely)
    val byPos = run1.sortBy(_._2).map(_._1).toSeq
    assert(byPos != byPos.sorted)
  }

  test("curate_lm_score: add-1 bigram mean matches a plain-Scala model") {
    // independent reimplementation: collect the corpus, build the same
    // add-1 bigram model in plain Scala, compare per-doc means (1e-12
    // tolerance — Scala sums doubles in corpus order, the query sums via
    // exact decimals; bit-exactness is the DuckDB oracle's job)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val bigrams = toks.toSeq.flatMap { case (id, w) =>
      w.zip(w.drop(1)).map(bg => (id, bg)) }
    val c2 = bigrams.groupBy(_._2).map { case (k, g) => k -> g.size }
    val c1 = bigrams.groupBy(_._2._1).map { case (k, g) => k -> g.size }
    val vocab = toks.values.flatten.toSet.size
    val out = SparkEntry.queries("curate_lm_score")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out.keySet == toks.keySet, "doc spine: one row per document")
    toks.foreach { case (id, w) =>
      val (nBigrams, score) = out(id)
      assert(nBigrams == math.max(w.size - 1, 0), s"doc $id")
      if (w.size < 2) assert(score.isEmpty, s"doc $id: short doc => NULL")
      else {
        val ps = w.zip(w.drop(1)).map(bg =>
          (c2(bg) + 1).toDouble / (c1(bg._1) + vocab))
        val expected = ps.sum / ps.size
        assert(math.abs(score.get - expected) <= 1e-12 * expected,
          s"doc $id: ${score.get} vs $expected")
        // every p is a smoothed probability with a seen numerator
        assert(score.get > 0 && score.get <= 1, s"doc $id")
      }
    }
    // the corpus-trained model must actually discriminate (not constant)
    val scores = out.values.flatMap(_._2)
    assert(scores.toSet.size > 1, "scores must vary across docs")
  }

  test("curate_dsir: importance scores match a plain-Scala model; " +
    "selection is the top quarter and favors the target domain") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val B = 4096L
    def buckets(text: String): Seq[Long] = {
      val w = text.split(" ").filter(_.nonEmpty).toSeq
      w.zip(w.drop(1)).map { case (a, b) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest((a + " " + b).getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % B
      }
    }
    val perDoc = docs.map { case (id, src, t) => (id, src, buckets(t)) }
    val all = perDoc.flatMap(_._3)
    val r = all.groupBy(identity).map { case (k, g) => k -> g.size }
    val t = perDoc.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).map { case (k, g) => k -> g.size }
    val (rtot, ttot) = (all.size, perDoc.filter(_._2 == "src0")
      .map(_._3.size).sum)
    val expected = perDoc.map { case (id, _, bs) =>
      id -> (if (bs.isEmpty) None else Some(bs.map(b =>
        ((t.getOrElse(b, 0) + 1).toDouble * (rtot + B)) /
          ((r(b) + 1).toDouble * (ttot + B))).sum / bs.size))
    }.toMap
    val out = SparkEntry.queries("curate_dsir")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3))).toMap
    assert(out.keySet == expected.keySet, "doc spine: one row per doc")
    expected.foreach { case (id, exp) =>
      val (nFeat, score, _) = out(id)
      assert(nFeat == perDoc.find(_._1 == id).get._3.size, s"doc $id")
      (score, exp) match {
        case (Some(got), Some(e)) =>
          assert(math.abs(got - e) <= 1e-12 * e, s"doc $id: $got vs $e")
        case (None, None) => // short doc: no features, never selected
          assert(!out(id)._3, s"doc $id")
        case other => fail(s"doc $id: score presence mismatch $other")
      }
    }
    // selection = exactly the top quarter by (score desc, doc_id asc)
    val rankedIds = out.toSeq.collect { case (id, (_, Some(sc), _)) =>
      (sc, id) }.sortBy { case (sc, id) => (-sc, id) }.map(_._2)
    val k = rankedIds.size / 4
    val selected = out.collect { case (id, (_, _, true)) => id }.toSet
    assert(selected == rankedIds.take(k).toSet,
      s"selected must be the deterministic top quarter (k=$k)")
    // the point of DSIR: target-domain docs are preferentially selected
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val selRate = (ids: Iterable[Long]) =>
      if (ids.isEmpty) 0.0 else ids.count(selected).toDouble / ids.size
    val (srcIds, restIds) = srcOf.keys.partition(srcOf(_) == "src0")
    assert(selRate(srcIds) > selRate(restIds),
      s"target selected at ${selRate(srcIds)} vs rest ${selRate(restIds)}")
  }

  test("ta_bpe_encode mechanics: adjacency via brackets, leftmost-greedy, " +
    "rank priority; registered query matches a plain-Scala reimplementation") {
    import CurationQueries.{bpeEncodeExpr, bpeTokenCount}
    def counts(rows: Seq[Seq[String]], merges: Seq[String]): Seq[Long] = {
      val df = rows.map(Tuple1(_)).toDF("w")
      df.select(bpeTokenCount(bpeEncodeExpr(col("w"), merges)).as("n"))
        .as[Long].collect().toSeq
    }
    // back-to-back occurrences BOTH merge (the shared-delimiter bug this
    // bracketing exists to avoid): "a b a b" -> [(ab), (ab)]
    assert(counts(Seq(Seq("a", "b", "a", "b")), Seq("a b")) == Seq(2L))
    // leftmost-greedy: "x x x" -> [(xx), x] — the middle x is consumed
    assert(counts(Seq(Seq("x", "x", "x")), Seq("x x")) == Seq(2L))
    // rank priority: in "a b c" with merges ["a b", "b c"], rank 1
    // consumes b, so rank 2 finds nothing
    assert(counts(Seq(Seq("a", "b", "c")), Seq("a b", "b c")) == Seq(2L))
    // a merged token is OPAQUE to later merges: ["b c" then "a b"] on
    // "a b c" -> rank 1 fuses (bc), rank 2's "a b" cannot split it
    assert(counts(Seq(Seq("a", "b", "c")), Seq("b c", "a b")) == Seq(2L))
    // empty and single-token docs pass through
    assert(counts(Seq(Seq.empty, Seq("solo")), Seq("a b")) == Seq(0L, 1L))
    // registered query == plain-Scala greedy reimplementation on the
    // fixture, with the independently re-derived merge list
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val pairCnt = texts.flatMap { case (_, t) =>
      val w = toks(t); w.zip(w.drop(1)).map { case (a, b) => a + " " + b }
    }.groupBy(identity).map { case (p, g) => p -> g.size }
    val merges = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(20).map(_._1)
    def encode(w: Seq[String]): Long = {
      var cur = w.map(Seq(_))
      for (m <- merges; Seq(a, b) = m.split(" ").toSeq) {
        val out = scala.collection.mutable.Buffer[Seq[String]]()
        var i = 0
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == Seq(a) && cur(i + 1) == Seq(b)) {
            out += Seq(a, b); i += 2
          } else { out += cur(i); i += 1 }
        }
        cur = out.toSeq
      }
      cur.length.toLong
    }
    val expected = texts.map { case (id, t) => id -> encode(toks(t)) }.toMap
    val out = CurationQueries.queries("ta_bpe_encode")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.length == texts.length)
    out.foreach { case (id, nRaw, nBpe) =>
      assert(nRaw == toks(texts.find(_._1 == id).get._2).length.toLong)
      assert(nBpe == expected(id), s"doc $id: $nBpe != ${expected(id)}")
      assert(nBpe <= nRaw && (nRaw == 0L || nBpe >= (nRaw + 1) / 2))
    }
    // the merge table actually bites on the fixture
    assert(out.exists { case (_, r, b) => b < r }, "no doc merged")
  }

  test("curate_probe_train: a plain-Scala GD replay matches every score " +
    "bit-for-bit, and the probe separates the weak label") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    // replay: binary hashed-bigram features, 2 exact GD steps
    def buckets(t: String): Set[Long] = {
      val w = t.split(" ").filter(_.nonEmpty)
      w.zip(w.drop(1)).map { case (a, b) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest((a + " " + b).getBytes("UTF-8"))
          .take(4).map(x => f"$x%02x").mkString
        java.lang.Long.parseLong(md, 16) % 64
      }.toSet
    }
    val feats = docs.map { case (id, _, t) => id -> buckets(t) }.toMap
    val y = docs.map { case (id, src, _) =>
      id -> (if (src == "src0") 1.0 else 0.0) }.toMap
    val withF = docs.map(_._1).filter(feats(_).nonEmpty)
    val nn = withF.size
    def dec(d: Double) = BigDecimal(d.toString).setScale(28,
      BigDecimal.RoundingMode.HALF_UP)
    var w = Map.empty[Long, Double].withDefaultValue(0.0)
    for (_ <- 1 to 2) {
      val pred = withF.map(id =>
        id -> feats(id).toSeq.map(b => dec(w(b))).sum.toDouble).toMap
      val gsum = scala.collection.mutable
        .Map[Long, BigDecimal]().withDefaultValue(BigDecimal(0))
      withF.foreach { id =>
        val r = pred(id) - y(id)
        feats(id).foreach(b => gsum(b) += dec(r))
      }
      w = w.keys.++(gsum.keys).map(b =>
        b -> (w(b) - 0.1 * (gsum(b).toDouble / nn))).toMap
        .withDefaultValue(0.0)
    }
    val want = docs.map { case (id, _, _) =>
      id -> (if (feats(id).isEmpty) None
        else Some(feats(id).toSeq.map(b => dec(w(b))).sum.toDouble)) }.toMap
    val got = CurationQueries.queries("curate_probe_train")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got.size == docs.length)
    val diffs = got.filter { case (id, v) => want(id) != v }
    assert(diffs.isEmpty, s"${diffs.size} scores drifted: ${diffs.take(3)}")
    // the trained probe separates the classes in the right direction
    val s0 = docs.filter(_._2 == "src0").flatMap(d => got(d._1))
    val rest = docs.filter(_._2 != "src0").flatMap(d => got(d._1))
    assert(s0.sum / s0.size > rest.sum / rest.size,
      "probe failed to separate the weak label")
  }

  test("curate_d4: stage flags agree with dedup_semantic, and the " +
    "survivor-only keep rule holds per cluster") {
    val d4 = CurationQueries.queries("curate_d4")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3)),
        r.getBoolean(4)))
    val sem = graft.queries.DedupQueries.queries("dedup_semantic")(
      spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(d4.length == sem.size)
    d4.foreach { case (id, _, dup, kept, survives) =>
      assert(dup == sem(id), s"vec $id sem_dup drifted from dedup_semantic")
      assert(kept.isEmpty == dup, s"vec $id proto_kept null-ness wrong")
      assert(survives == (!dup && kept.contains(true)), s"vec $id verdict")
    }
    // keep rule over survivors: per cell, kept == max(1, ⌊3n/4⌋)
    d4.filter(!_._3).groupBy(_._2).foreach { case (cell, rows) =>
      val n = rows.length
      val kept = rows.count(_._4.contains(true))
      assert(kept == math.max(1, 3 * n / 4), s"cell $cell kept $kept of $n")
    }
    // the composition actually bites both ways on the fixture
    assert(d4.exists(_._3) && d4.exists(r => !r._3 && r._4.contains(false)))
  }

  test("ta_fertility: per-language ratios equal a recomputation from " +
    "ta_bpe_encode, and the word-merge tokenizer compresses") {
    val enc = CurationQueries.queries("ta_bpe_encode")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val meta = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val byLang = enc.groupBy { case (id, _, _) => meta(id)._1 }
    val got = CurationQueries.queries("ta_fertility")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val words = rows.map(_._2).sum
      val toksN = rows.map(_._3).sum
      val chars = rows.map { case (id, _, _) => meta(id)._2 }.sum
      val (gw, gt, fert, cpt) = got(lang)
      assert(gw == words && gt == toksN, s"$lang counts drifted")
      assert(fert == math.floor(toksN.toDouble * 10000 / words).toLong)
      assert(cpt == math.floor(chars.toDouble * 10000 / toksN).toLong)
      // our BPE merges whole word-tokens, so the tokenizer can only
      // COMPRESS: fertility ≤ 1.0 (10000 bp), and strictly < where the
      // merge table bites
      assert(fert > 0 && fert <= 10000, s"$lang fertility $fert")
    }
    assert(got.values.exists(_._3 < 10000), "merges never fired")
  }
}
