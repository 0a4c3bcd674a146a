package graft.queries

import graft.Tables
import graft.functions.BloomFilterAggregator
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 curation operators: Bloom-prefiltered decontamination,
  * substring-level dedup scoring, scalable decile bucketing, target-share
  * dataset mixing, PII redaction, and mergeable HLL sketches.
  *
  * Same determinism rules as [[PipelineQueries]] (basis-point integer
  * ratios, md5-hash sampling, total window orders).
  */
object CurationQueries {

  /** k-th Bloom bit position for a key column — pure built-ins
    * (`pmod(xxhash64(k, key), M)`), so the build aggregate and the probe
    * predicate derive bit positions from the SAME codegen'd expression. */
  private[graft] def bloomPos(i: Int, key: Column): Column =
    pmod(xxhash64(lit(i), key), lit(BloomFilterAggregator.MBits.toLong))

  /** Probe a filter (one `typedlit` literal Column, hoisted by the caller
    * so k probes share a single copy of the array in the plan) at `pos`:
    * word = pos >> 6, bit = pos & 63 — all codegen'd built-ins. */
  private[graft] def mightContain(bits: Column, pos: Column): Column =
    call_function("shiftright",
      element_at(bits, shiftright(pos, 6).cast("int") + 1),
      pos.bitwiseAND(lit(63L)).cast("int"))
      .bitwiseAND(lit(1L)) === lit(1L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-prefiltered benchmark decontamination — decontam_overlap's
    // at-scale twin. The benchmark shingle set becomes a 32 KB Bloom
    // filter (built distributed via BloomFilterAggregator: partial
    // buffers OR map-side, one array per partition crosses the wire);
    // the corpus side then drops ~(1−FPR) of its non-contaminated
    // shingles with a pure codegen'd predicate BEFORE the join. Bloom
    // filters have no false negatives and the surviving candidates are
    // verified by the exact broadcast join, so results are identical to
    // decontam_overlap (shared oracle). At 100 TB this is the shape that
    // matters: the filter is bounded model state however large the
    // benchmark set, and the join input shrinks by the reject rate.
    "decontam_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bloomAgg = udaf(BloomFilterAggregator)
      val benchSh = docs.filter(col("source") === "src0")
        .select(explode(shingles(col("text"), 3)).as("s"))
      // bounded model state (like IVF centroids): MBits/8 bytes, corpus-
      // size independent. Bloom insertion is idempotent, so the build
      // skips the distinct shuffle the broadcast-join side needs.
      val bits: Seq[Long] = benchSh
        .select(bloomAgg(bloomPos(0, col("s")), bloomPos(1, col("s")),
          bloomPos(2, col("s"))).as("bits"))
        .head.getSeq[Long](0)
      val corpus = docs.filter(col("source") =!= "src0")
        .repartition(col("doc_id"))
        .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))
      val bitsLit = typedlit(bits)
      val candidates = corpus.filter(
        Seq(0, 1, 2).map(i => mightContain(bitsLit, bloomPos(i, col("s"))))
          .reduce(_ && _))
      candidates.join(broadcast(benchSh.distinct()), "s")
        .groupBy("doc_id")
        .agg(countDistinct(col("s")).as("n_shared"))
    }),

    // Substring-level dedup scoring (the ExactSubstr idea at 5-gram
    // granularity): per doc, the share of its distinct 5-gram shingles
    // first seen in an earlier (lower doc_id) document. A doc that is
    // mostly recycled spans scores high even when no single pair clears a
    // document-level jaccard threshold. Shape: one explode + one window
    // min on the shingle key + one per-doc aggregate — two shuffles,
    // no joins, linear in corpus shingles at any scale.
    "dedup_substr_seen" -> ((s, d) => {
      val idx = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), explode(shingles(col("text"), 5)).as("s"))
      idx
        .withColumn("first_owner",
          min(col("doc_id")).over(Window.partitionBy("s")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_owner") < col("doc_id"), 1L).otherwise(0L))
            .as("n_seen"))
        .select(col("doc_id"), col("n_shingles"),
          floor(col("n_seen").cast("double") * 10000 / col("n_shingles"))
            .cast("long").as("seen_bp"))
    }),

    // Length-decile bucketing (curriculum/packing prep) WITHOUT a
    // single-partition global window: global row_number via the shared
    // range-partition + offset machinery
    // (ExtraRelationalQueries.globalRowNumber, same as q54), then SQL
    // NTILE's exact bucket arithmetic (first n mod b buckets get one
    // extra row) computed from (rank, total) — so the plan scales while
    // matching the NTILE(10) oracle bit-for-bit.
    "q55_decile_bucket" -> ((s, d) => {
      // NTILE semantics: q = total div 10, r = total mod 10; the first r
      // buckets hold q+1 rows. when() keeps the q=0 branch unevaluated
      // for tiny inputs (where every row lands in the first branch).
      val q = floor(col("total").cast("double") / 10).cast("long")
      val r = col("total") - q * 10
      ExtraRelationalQueries.globalRowNumber(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        32, col("n_chars").asc, col("doc_id").asc)
        .withColumn("decile",
          when(col("global_rn") <= r * (q + 1),
            ceil(col("global_rn").cast("double") / (q + 1)))
            .otherwise(
              r + ceil((col("global_rn") - r * (q + 1)).cast("double") / q))
            .cast("int"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    }),

    // Target-share dataset mixing: each source shard gets a target weight
    // (derived here from the shard number — stand-in for a curated
    // "web 4 : books 2 : code 1" recipe); the largest feasible mixture
    // hitting those proportions exactly keeps c·w_s docs of shard s where
    // c = min_s(n_s/w_s). Selection is deterministic md5-hash sampling
    // (replay-stable). Shape: one tiny per-source stats aggregate
    // broadcast back, then a pure filter — same scale story as
    // sample_temperature but for arbitrary target recipes.
    "mix_sources_target" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = docs.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("wt",
          (pmod(substring(col("source"), 4, 10).cast("int"), lit(4)) + 1)
            .cast("double"))
        .withColumn("c", min(col("n").cast("double") / col("wt"))
          .over(Window.partitionBy()))
        .withColumn("rate", col("c") * col("wt") / col("n"))
        .select("source", "rate")
      val u = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0
      docs.join(broadcast(rates), "source")
        .filter(u < col("rate"))
        .select(col("doc_id"), col("source"))
    }),

    // PII redaction: email/SSN/IPv4 patterns replaced with typed tags,
    // per-pattern hit counts kept for audit. Pure per-row map work — no
    // shuffle, linear at any scale. (This fixture's vocabulary contains
    // no PII, so the registered query proves exact pass-through — the
    // redaction behavior itself is pinned on planted PII in
    // CurationSpec.) Patterns stay in the RE2 ∩ java.util.regex common
    // subset so both engines compile them identically.
    "ta_pii_scrub" -> ((s, d) => {
      Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            lit(EmailRe), lit("<EMAIL>")),
            lit(SsnRe), lit("<SSN>")),
            lit(Ipv4Re), lit("<IP>")).as("scrubbed"),
          regexp_count(col("text"), lit(EmailRe)).cast("int").as("n_email"),
          regexp_count(col("text"), lit(SsnRe)).cast("int").as("n_ssn"),
          regexp_count(col("text"), lit(Ipv4Re)).cast("int").as("n_ip"))
    }),

    // Mergeable distinct-count sketches (Apache DataSketches HLL via
    // Spark built-ins): per-language token sketches + their union — the
    // sketch algebra a 100 TB pipeline ships to the driver instead of
    // re-scanning for every slice combination (union of per-shard
    // sketches ≡ sketch of the union; partial aggregation map-side).
    // Estimates are probabilistic ⇒ rows-only; CurationSpec pins relative
    // error vs exact distinct counts.
    "sketch_hll_union" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("lang"), explode(tokens(col("text"))).as("t"))
      val perLang = toks.groupBy("lang")
        .agg(hll_sketch_agg(col("t")).as("sk"))
      val union = perLang.agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit("*all*").as("lang"), col("sk"))
      perLang.select(col("lang"), col("sk")).unionAll(union)
        .select(col("lang"),
          hll_sketch_estimate(col("sk")).as("est_distinct"))
    }))

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private[graft] val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  val oracles: Map[String, String] = Map(
    // Bloom prefilter has no false negatives and candidates are verified
    // by the exact join ⇒ identical to the unfiltered sweep.
    "decontam_bloom" -> PipelineQueries.oracles("decontam_overlap"),
    "dedup_substr_seen" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 5 THEN
        |    list_distinct(list_transform(generate_series(1, len(w)-4),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |           w[i+3] || ' ' || w[i+4]))
        |    ELSE [] END AS shingles
        |  FROM docs),
        |idx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |o AS (SELECT doc_id,
        |  MIN(doc_id) OVER (PARTITION BY s) AS first_owner FROM idx)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN first_owner < doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) * 10000 / COUNT(*)) AS BIGINT) AS seen_bp
        |FROM o GROUP BY doc_id""".stripMargin,
    "q55_decile_bucket" ->
      """WITH r AS (
        |  SELECT n_chars,
        |    NTILE(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
        |  FROM documents)
        |SELECT CAST(decile AS INTEGER) AS decile, COUNT(*) AS n_docs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM r GROUP BY decile""".stripMargin,
    "mix_sources_target" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n,
        |    CAST(CAST(substring(source, 4) AS INTEGER) % 4 + 1 AS DOUBLE) AS wt
        |  FROM documents GROUP BY source),
        |r AS (SELECT source,
        |  (MIN(CAST(n AS DOUBLE) / wt) OVER ()) * wt / n AS rate FROM c)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT) / 4294967296.0 < r.rate""".stripMargin,
    "ta_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{3}-\d{2}-\d{4}\b')) AS INTEGER) AS n_ssn,
        |  CAST(len(regexp_extract_all(text,
        |    '\b(\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS n_ip
        |FROM documents""".stripMargin)
}
