package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * token statistics, quality scoring, language-ID heuristic, document
  * fingerprinting. All per-document map work — embarrassingly parallel, no
  * shuffle except final aggregates; scales linearly with corpus size.
  *
  * Language-ID is an honest marker-word heuristic (fixed stopword lists per
  * language, deterministic argmax) — on this synthetic corpus it mostly
  * answers 'en'/'und', and the oracle checks the *formula*, not the
  * fixture's random `lang` column.
  */
object TextQueries {

  /** documents + a token array column. Deliberately NO exchange barrier:
    * CollapseProject inlines `toks` into each consuming expression, so a
    * query using it k times re-tokenizes k× — a bounded, linear CPU cost
    * that keeps the whole text family shuffle-free (a barrier here would
    * push every token of the corpus across the wire to save a few string
    * splits; at 100 TB that trade is absurd). Per-ELEMENT (quadratic)
    * re-evaluation inside lambdas is the case that does justify a
    * barrier — see sim_quantize_int8 / unitEmbeddings. */
  private[queries] def docsWithToks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ta_token_stats" -> ((s, d) => {
      val toks = col("toks")
      docsWithToks(s, d).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        length(col("text")).as("n_chars_text"),
        // empty doc -> NULL, not NaN/crash (guards cost nothing when the
        // denominator is non-zero; ANSI mode throws on casting the Inf
        // from x/0 — see RobustnessSpec)
        when(size(toks) > 0, round(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
            / size(toks), 4)).as("avg_token_len"),
        // BPE-ish token estimate: letter runs, digit runs, single symbols
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"),
          lit(0))).as("n_bpeish"))
    }),

    // Ratios reported in exact basis points (floor((k*10000)/n)): integer
    // arithmetic end-to-end, so values are bit-identical across engines.
    // (round(double, 4) is NOT cross-engine stable: Spark rounds the
    // shortest decimal repr via BigDecimal.valueOf, DuckDB rounds the true
    // binary value — they disagree on half-boundary values.)
    "ta_quality" -> ((s, d) => {
      // zero-denominator guard: empty docs score NULL instead of crashing
      // the whole job (ANSI cast of the Inf from x/0 throws)
      def bp(num: Column, den: Column): Column =
        when(den > 0, floor(num.cast("double") * 10000 / den).cast("long"))
      val toks = col("toks")
      val nToks = size(toks)
      val punct = length(regexp_replace(col("text"), "[\\p{L}\\s]", ""))
      val stopHits = size(filter(toks, t =>
        t.isin(langMarkers.flatMap(_._2).distinct: _*)))
      docsWithToks(s, d).select(
        col("doc_id"),
        nToks.as("n_tokens"),
        bp(punct, length(col("text"))).as("punct_bp"),
        bp(stopHits, nToks).as("stopword_bp"),
        when(length(col("text")) > 0 && nToks > 0,
          least(lit(10000L), nToks.cast("long") * 200)
            - floor(punct.cast("double") * 5000 / length(col("text"))).cast("long")
            + floor(stopHits.cast("double") * 1000 / nToks).cast("long"))
          .as("quality_bp"))
    }),

    "ta_langid" -> ((s, d) => {
      val toks = col("toks")
      val scored = docsWithToks(s, d).select(
        (Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
          langMarkers.map { case (l, ms) =>
            size(filter(toks, t => t.isin(ms: _*))).as(s"s_$l")
          }): _*)
      scored.select(
        col("doc_id"), col("labeled_lang"),
        col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
        when(col("s_en") > 0 && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") > 0 && col("s_es") >= col("s_de") &&
            col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") > 0 && col("s_de") >= col("s_fr"), "de")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und").as("predicted_lang"))
    }),

    // Split in two so the md5 half is oracle-checked: the rolling hash is
    // xxhash64-based (not DuckDB-expressible) and would otherwise drag the
    // md5 fingerprint down to rows-only with it.
    "ta_fingerprint" -> ((s, d) => {
      val toks = col("toks")
      docsWithToks(s, d).select(
        col("doc_id"),
        // order-sensitive Karp–Rabin rolling hash (Scala/xxhash-based —
        // covered by ScalaTest, not SQL-expressible)
        rollingFingerprint(toks).as("rolling_fp"))
    }),

    // content fingerprint: md5 of the normalized (single-spaced) text
    "ta_fingerprint_md5" -> ((s, d) => {
      docsWithToks(s, d).select(
        col("doc_id"),
        md5(concat_ws(" ", col("toks")).cast("binary")).as("md5_fp"))
    }),
// Document chunking: 32-token sliding windows, stride 16 (the core
    // pretraining-prep op). One generator row per chunk; trailing partial
    // chunks kept. Linear, shuffle-free.
    "ta_chunks" -> ((s, d) => {
      val n = size(col("toks"))
      docsWithToks(s, d)
        // token-less docs produce no chunks (and sequence(1, 0, 16) is an
        // error, not an empty array — see RobustnessSpec)
        .filter(n > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(1), n, lit(16))).as(Seq("ci", "start")))
        .select(col("doc_id"),
          col("ci").cast("int").as("chunk_idx"),
          concat_ws(" ", slice(col("toks"), col("start"), lit(32)))
            .as("chunk_text"),
          size(slice(col("toks"), col("start"), lit(32)))
            .as("n_chunk_tokens"))
    }),

    // Normalization: trim, lowercase, collapse whitespace + content hash.
    "ta_normalize" -> ((s, d) => {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      Tables.documents(s, d).select(
        col("doc_id"), norm.as("norm_text"),
        md5(norm.cast("binary")).as("norm_md5"))
    }),

    // TF-IDF components: term frequency per (doc, word) joined with
    // document frequency per word — two aggregation levels + a join, all
    // integer-exact. (The idf logarithm itself is libm-dependent, so the
    // oracle checks tf/df/N; ln stays engine-side.)
    "ta_tfidf" -> ((s, d) => {
      val tf = docsWithToks(s, d)
        .select(col("doc_id"), explode(col("toks")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "word")
        .select(col("doc_id"), col("word"), col("tf"), col("df"))
    }),

    // BM25 retrieval scoring (Robertson et al., Okapi at TREC-3 1994)
    // against a fixed query term set, in EXACT integer arithmetic so the
    // score is bit-identical cross-engine. Two textbook substitutions,
    // both order-preserving per term: (a) the idf log is dropped in favor
    // of the raw Robertson–Spärck-Jones odds (N − df + ½)/(df + ½) —
    // scaled by 2 to clear the halves — and (b) k1 = 1.2, b = 0.75 are
    // cleared to integers by multiplying the saturation term through by
    // 20·T (T = corpus token count), giving per-term basis points
    //   floor(10⁴ · (2N−2df+1)/(2df+1) · 44·T·tf / (20·T·tf + 6·T + 18·dl·N)).
    // decimal(38,0) intermediates (DuckDB: HUGEINT) keep the products
    // exact far beyond the 64-bit overflow point (~sf1 in longs).
    //
    // 100 TB shape: tokens are filtered to the q query terms BEFORE any
    // exchange (the corpus-wide explode feeds a map-side-combined
    // groupBy on the filtered subset only); df is a q-row aggregate and
    // (N, T) a 1-row scalar, both broadcast back. One fingerprint-sized
    // shuffle total; raw text never crosses the wire. The fixed-term
    // variant IS the production shape — a query batch replaces the
    // literal list with a broadcast terms table, nothing else moves.
    "retrieve_bm25" -> ((s, d) => {
      val terms = Seq("spark", "join", "window")
      val dl = docsWithToks(s, d)
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
      val tf = dl
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "tok")
        .crossJoin(broadcast(stats)) // 1-row corpus stats
        .withColumn("term_bp", expr(
          """(CAST(10000 AS DECIMAL(38,0)) * (2*n_docs - 2*df + 1) * 44 * t_tokens * tf)
            | div
            |((CAST(2 AS DECIMAL(38,0))*df + 1) *
            | (CAST(20 AS DECIMAL(38,0))*t_tokens*tf + 6*t_tokens + 18*dl*n_docs))"""
            .stripMargin))
        .groupBy("doc_id").agg(sum(col("term_bp")).as("score_bp"))
        .select(col("doc_id"), col("score_bp"))
    }),

    // The batch-retrieval twin of retrieve_bm25 — the production shape
    // stated in its scale note, made concrete: the query terms arrive as
    // a TABLE (qid, term), not a literal list. The corpus-side plan is
    // unchanged (filter-before-shuffle becomes a broadcast LEFT SEMI
    // against the distinct term set; df and (N, T) exactly as before);
    // scoring fans each matching (doc, term) out to its queries via a
    // broadcast join on term, and the per-query top-10 compiles to a
    // WindowGroupLimit bounded heap. Scoring arithmetic is byte-for-byte
    // retrieve_bm25's, so the same exactness argument pins it.
    "retrieve_bm25_batch" -> ((s, d) => {
      val qt = broadcast(s.createDataFrame(Seq(
        (1L, "spark"), (1L, "join"), (2L, "window"), (2L, "table"),
        (3L, "data"), (3L, "query"), (3L, "filter"))).toDF("qid", "term"))
      val dl = docsWithToks(s, d)
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
      val tf = dl
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .join(broadcast(qt.select(col("term").as("tok")).distinct()),
          Seq("tok"), "left_semi")
        .groupBy(col("doc_id"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "tok")
        .join(broadcast(qt.select(col("qid"), col("term").as("tok"))), "tok")
        .crossJoin(broadcast(stats))
        .withColumn("term_bp", expr(
          """(CAST(10000 AS DECIMAL(38,0)) * (2*n_docs - 2*df + 1) * 44 * t_tokens * tf)
            | div
            |((CAST(2 AS DECIMAL(38,0))*df + 1) *
            | (CAST(20 AS DECIMAL(38,0))*t_tokens*tf + 6*t_tokens + 18*dl*n_docs))"""
            .stripMargin))
        .groupBy("qid", "doc_id").agg(sum(col("term_bp")).as("score_bp"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("score_bp").desc, col("doc_id").asc)))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("doc_id"), col("rank"), col("score_bp"))
    }),

    // Collocation mining (Church & Hanks 1990): corpus bigrams whose
    // co-occurrence beats chance — PMI's log dropped in favor of its
    // exact-integer argument, the LIFT n·T_u² / (T_b·c1·c2), floored to
    // basis points (10⁴ = independence). Same monotone-per-term move as
    // retrieve_bm25's odds idf: ranking and thresholds are unchanged,
    // the arithmetic becomes cross-engine bit-exact. Min support n ≥ 5
    // (PMI's classic low-count pathology — a hapax pair maxes the score).
    //
    // 100 TB shape: two narrow token-keyed aggregates (bigram counts +
    // unigram counts, both map-side combined), then token-keyed joins of
    // the SUPPORTED bigrams against the vocab-scale unigram table —
    // vocab tables join, they don't broadcast (the curate_lm_score
    // rule); the two totals are a broadcast 1-row scalar. Headroom:
    // decimal(38,0) holds 10⁴·n·T_u² exactly to ~10¹⁵-token corpora at
    // n ≤ 10⁸; past that the exact-integer lift yields to log-space PMI
    // in doubles (the reporting scale changes, not the plan).
    "ta_collocations" -> ((s, d) => {
      val toks = docsWithToks(s, d).select(col("toks").as("w"))
      val nb = greatest(size(col("w")) - 1, lit(0))
      val cxy = toks
        .select(explode(zip_with(
          slice(col("w"), lit(1), nb), slice(col("w"), lit(2), nb),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("n"))
      val uni = toks.select(explode(col("w")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val scalars = broadcast(cxy.agg(sum(col("n")).as("t_big"))
        .crossJoin(uni.agg(sum(col("c")).as("t_uni"))))
      cxy.filter(col("n") >= 5)
        .join(uni.select(col("t").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("t").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(scalars)
        .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("n"),
          expr("""(CAST(10000 AS DECIMAL(38,0)) * n * t_uni * t_uni)
                 | div (CAST(t_big AS DECIMAL(38,0)) * c1 * c2)""".stripMargin)
            .as("lift_bp"))
    }))

  // ta_fingerprint (rolling_fp) is xxhash64-based and not reproducible in
  // DuckDB — rows-only, determinism pinned in TextQueriesSpec. The md5
  // fingerprint lives in ta_fingerprint_md5 and is oracle-checked.
  val oracles: Map[String, String] = Map(
    "ta_fingerprint_md5" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ')) AS md5_fp
        |FROM documents""".stripMargin,
    "ta_token_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |  CAST(LENGTH(text) AS INTEGER) AS n_chars_text,
        |  ROUND(CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE)
        |        / NULLIF(len(toks), 0), 4) AS avg_token_len,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |       AS INTEGER) AS n_bpeish
        |FROM t""".stripMargin,
    "ta_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |  LENGTH(regexp_replace(text, '[\p{L}\s]', '', 'g')) AS punct
        |  FROM documents),
        |u AS (SELECT doc_id, text, toks, punct,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','is','el','la','de','y','es','der','die','das','und','ist','le','et','est'))) AS stop_hits
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(FLOOR(CAST(punct AS DOUBLE) * 10000 / NULLIF(LENGTH(text), 0)) AS BIGINT) AS punct_bp,
        |  CAST(FLOOR(CAST(stop_hits AS DOUBLE) * 10000 / NULLIF(len(toks), 0)) AS BIGINT) AS stopword_bp,
        |  CASE WHEN LENGTH(text) > 0 AND len(toks) > 0 THEN
        |    LEAST(10000, CAST(len(toks) AS BIGINT) * 200)
        |      - CAST(FLOOR(CAST(punct AS DOUBLE) * 5000 / LENGTH(text)) AS BIGINT)
        |      + CAST(FLOOR(CAST(stop_hits AS DOUBLE) * 1000 / len(toks)) AS BIGINT)
        |  END AS quality_bp
        |FROM u""".stripMargin,
    "ta_langid" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id, labeled_lang,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS INTEGER) AS s_en,
        |  CAST(len(list_filter(toks, x -> x IN ('el','la','de','y','es'))) AS INTEGER) AS s_es,
        |  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INTEGER) AS s_de,
        |  CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','est'))) AS INTEGER) AS s_fr
        |  FROM t)
        |SELECT doc_id, labeled_lang, s_en, s_es, s_de, s_fr,
        |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS predicted_lang
        |FROM sc""".stripMargin,
    "ta_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |  unnest(generate_series(1, len(toks), 16)) AS start,
        |  generate_subscripts(generate_series(1, len(toks), 16), 1) AS ci
        |  FROM t)
        |SELECT doc_id,
        |  CAST(ci - 1 AS INTEGER) AS chunk_idx,
        |  array_to_string(list_slice(toks, start, start + 31), ' ') AS chunk_text,
        |  CAST(len(list_slice(toks, start, start + 31)) AS INTEGER) AS n_chunk_tokens
        |FROM c""".stripMargin,
    "ta_normalize" ->
      """SELECT doc_id,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_md5
        |FROM documents""".stripMargin,
    "ta_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents),
        |tfc AS (SELECT doc_id, word, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
        |dfc AS (SELECT word, COUNT(*) AS df FROM tfc GROUP BY 1)
        |SELECT tfc.doc_id, tfc.word, tfc.tf, dfc.df
        |FROM tfc JOIN dfc ON tfc.word = dfc.word""".stripMargin,
    "retrieve_bm25" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
        |g AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl),
        |tf AS (
        |  SELECT doc_id, dl, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        |  WHERE tok IN ('spark', 'join', 'window')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id,
        |    (CAST(10000 AS HUGEINT) * (2*g.n_docs - 2*dfq.df + 1) * 44
        |       * g.t_tokens * tf.tf)
        |    // ((CAST(2 AS HUGEINT)*dfq.df + 1) *
        |       (CAST(20 AS HUGEINT)*g.t_tokens*tf.tf + 6*g.t_tokens
        |        + 18*tf.dl*g.n_docs)) AS term_bp
        |  FROM tf JOIN dfq USING (tok), g)
        |SELECT doc_id, CAST(SUM(term_bp) AS BIGINT) AS score_bp
        |FROM sc GROUP BY 1""".stripMargin,
    "retrieve_bm25_batch" ->
      """WITH qt(qid, term) AS (VALUES
        |  (1, 'spark'), (1, 'join'), (2, 'window'), (2, 'table'),
        |  (3, 'data'), (3, 'query'), (3, 'filter')),
        |d AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |dl AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
        |g AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl),
        |tf AS (
        |  SELECT doc_id, dl, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        |  WHERE tok IN (SELECT term FROM qt)
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT qt.qid, tf.doc_id,
        |    (CAST(10000 AS HUGEINT) * (2*g.n_docs - 2*dfq.df + 1) * 44
        |       * g.t_tokens * tf.tf)
        |    // ((CAST(2 AS HUGEINT)*dfq.df + 1) *
        |       (CAST(20 AS HUGEINT)*g.t_tokens*tf.tf + 6*g.t_tokens
        |        + 18*tf.dl*g.n_docs)) AS term_bp
        |  FROM tf JOIN dfq USING (tok) JOIN qt ON qt.term = tf.tok, g),
        |scored AS (
        |  SELECT qid, doc_id, SUM(term_bp) AS score_bp FROM sc GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qid, doc_id, score_bp,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY score_bp DESC, doc_id ASC) AS rank
        |  FROM scored)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(rank AS INTEGER) AS rank,
        |  CAST(score_bp AS BIGINT) AS score_bp
        |FROM ranked WHERE rank <= 10""".stripMargin,
    "ta_collocations" ->
      """WITH docs AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |big AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w)-1), i -> w[i])) AS w1,
        |         unnest(list_transform(generate_series(1, len(w)-1), i -> w[i+1])) AS w2
        |  FROM docs WHERE len(w) >= 2),
        |cxy AS (SELECT w1, w2, COUNT(*) AS n FROM big GROUP BY 1, 2),
        |unic AS (SELECT t, COUNT(*) AS c
        |         FROM (SELECT unnest(w) AS t FROM docs) GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(n) FROM cxy) AS t_big,
        |               (SELECT SUM(c) FROM unic) AS t_uni)
        |SELECT cxy.w1 || ' ' || cxy.w2 AS bigram, cxy.n,
        |  CAST((CAST(10000 AS HUGEINT) * cxy.n * tot.t_uni * tot.t_uni)
        |       // (CAST(tot.t_big AS HUGEINT) * u1.c * u2.c) AS BIGINT) AS lift_bp
        |FROM cxy
        |JOIN unic u1 ON u1.t = cxy.w1
        |JOIN unic u2 ON u2.t = cxy.w2, tot
        |WHERE cxy.n >= 5""".stripMargin)
}
