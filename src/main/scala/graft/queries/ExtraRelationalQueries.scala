package graft.queries

import graft.Tables
import graft.operators.Checkpoint.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-2 relational depth: correlated subqueries, unpivot, value-based
  * (RANGE) window frames, the full ranking-function family, and
  * first/last/nth_value frames. Same determinism rules as
  * [[RelationalQueries]] (DECIMAL sums, total window orders).
  */
object ExtraRelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact global row_number WITHOUT a single-partition window, shared by
    * q54 and q55: bucket rows by DETERMINISTIC value ranges of the leading
    * sort key (boundaries = nParts-1 approximate quantiles, collected once
    * and re-embedded as literals), rank within each bucket by the full
    * sort order, then add each bucket's cumulative predecessor count (an
    * nBuckets-row stats aggregate broadcast back — never a global shuffle
    * to one task). Because the bucket is a pure function of row values and
    * fixed literals, the two downstream evaluations (ranking and bucket
    * counts) always agree — no materialization barrier needed, unlike
    * repartitionByRange whose SAMPLED boundaries can differ per evaluation
    * (observed at sf0.1 in round 3; the localCheckpoint that papered over
    * it tripled q54's runtime). Boundary quality only affects balance,
    * never correctness: equal leading keys always share a bucket, and the
    * full key tuple is a total order within it. At 100 TB this is the
    * classic two-pass ranged sort: one cheap single-column stats pass,
    * one ranked pass.
    *
    * `firstKey` must name a non-null, non-NaN numeric column that is the
    * leading sort key (enforced: a null or NaN key would fold into bucket
    * 0 while Spark's sort places nulls/NaN elsewhere, silently corrupting
    * global_rn — the keyed pass raises instead); `sortCols` is the
    * complete total order (including the leading key with its direction).
    * Output = input columns + `global_rn` + `total` (row count, for
    * rank-derived arithmetic like NTILE). */
  private[graft] def globalRowNumber(
      df: DataFrame, nParts: Int, firstKey: String, firstAsc: Boolean,
      sortCols: Column*): DataFrame = {
    val working =
      Seq("__grn_key", "__grn_bnds", "__grn_bucket", "__grn_rn",
        "__grn_offset")
    require((working :+ "global_rn" :+ "total")
      .forall(!df.columns.contains(_)),
      s"globalRowNumber: input must not contain ${working.mkString(", ")}, " +
        "global_rn, total")
    // Orient the key so bucket order == sort order regardless of direction.
    val signed =
      if (firstAsc) col(firstKey).cast("double")
      else -col(firstKey).cast("double")
    // Cheap codegen'd guard: assert_true returns NULL when the predicate
    // holds (taking the `signed` branch) and raises otherwise — a null or
    // NaN leading key fails loudly instead of mis-bucketing.
    val keyOk = col(firstKey).isNotNull && !isnan(col(firstKey).cast("double"))
    val keyed = df.withColumn("__grn_key",
      when(assert_true(keyOk, lit(
        s"globalRowNumber: leading key '$firstKey' must be non-null and " +
          "non-NaN")).isNull, signed))
    val probs = (1 until nParts).map(_.toDouble / nParts).toArray
    // Bucket boundaries IN-PLAN, so callers stay fully lazy (the old
    // `stat.approxQuantile` ran a driver stats job during query
    // CONSTRUCTION): one percentile_approx aggregate over the pruned
    // key column yields a ≤(nParts−1)-element boundary array,
    // broadcast-crossed onto every row; the bucket id is the count of
    // boundaries strictly below the key — monotone in the key, so the
    // approximation shapes bucket balance only, never order. The 1-row
    // result is LAZILY checkpointed: still zero construction jobs, but
    // the key-column stats pass runs once per execution and is reused
    // by the ranked side, the offsets side, and any consumer that
    // re-executes the frame (round-11: it re-ran per evaluation,
    // q54 0.56→0.77 s).
    val boundsRow = graft.operators.Checkpoint.lazily(
      keyed.agg(array_sort(array_distinct(
        percentile_approx(col("__grn_key"), typedLit(probs), lit(100))))
        .as("__grn_bnds")))
    // Lazily checkpoint the bucketed rows (r17): the ranked side and
    // the offsets side both consume this frame, and the offsets side —
    // built first, as the broadcast join's build job — otherwise
    // re-runs the whole upstream scan+bucket pipeline that the ranked
    // side then runs AGAIN. First execution materializes once (narrow
    // key columns only at every call site), the other side reads the
    // materialized rows: one input scan instead of two per evaluation.
    val bucketed = graft.operators.Checkpoint.lazily(
      keyed.crossJoin(broadcast(boundsRow))
        .withColumn("__grn_bucket",
          size(filter(col("__grn_bnds"), b => col("__grn_key") > b)))
        .drop("__grn_bnds"))
    val wIn = Window.partitionBy("__grn_bucket").orderBy(sortCols: _*)
    val ranked = bucketed.withColumn("__grn_rn", row_number().over(wIn))
    // per-bucket sizes -> cumulative offsets (windows here run over
    // <= nParts rows, not data)
    val wB = Window.orderBy("__grn_bucket")
    val offsets = bucketed.groupBy("__grn_bucket").count()
      .withColumn("__grn_offset", coalesce(sum(col("count")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("count")).over(
        wB.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__grn_bucket", "__grn_offset", "total")
    ranked.join(broadcast(offsets), "__grn_bucket")
      .withColumn("global_rn",
        (col("__grn_rn") + col("__grn_offset")).cast("long"))
      .drop("__grn_key", "__grn_bucket", "__grn_rn", "__grn_offset")
  }

  /** Morton spread: scatter the low 16 bits of `x` into the even bit
    * positions of a 32-bit lane (the standard mask-shift cascade) — long
    * arithmetic only, bounded below 2^33, so ANSI-safe and codegen'd. */
  /** Interleaved 2-D Morton key over the low 16 bits of each dimension —
    * shared by q56's bucket histogram and Layout.writeZOrdered's
    * persisted clustering. */
  private[graft] def zOrderKey(x: Column, y: Column): Column =
    mortonSpread(x).bitwiseOR(shiftleft(mortonSpread(y), 1))

  private[graft] def mortonSpread(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** q72's SCD2 dimension build: island-compressed activity-state
    * versions over the NON-purchase events, with lead()-derived
    * half-open validity [valid_from_us, valid_until_us) — NULL until =
    * open-ended last version. All on one user_id exchange. Shared with
    * the streaming twin (StreamingJobs.pitServe) so batch and stream
    * dimensions cannot diverge. */
  private[graft] def scd2PitDim(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    events
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .filter(col("us").isNotNull)
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id", "island")
      .agg(min(col("event_type")).as("state_type"),
        min(col("us")).as("valid_from_us"))
      .withColumn("valid_until_us", lead(col("valid_from_us"), 1)
        .over(Window.partitionBy("user_id")
          .orderBy(col("valid_from_us").asc, col("island").asc)))
  }

  /** The point-in-time lookup itself: facts (event rows) against a
    * [[scd2PitDim]] dimension — user_id equi-join with the half-open
    * interval as a pure residual. Works unchanged whether `facts` is a
    * batch DataFrame (q72_pit_join) or a streaming one (stream-static
    * join in StreamingJobs.pitServe): the code path is literally shared. */
  private[graft] def pitLookup(facts: DataFrame, dim: DataFrame): DataFrame =
    facts
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
      .join(dim,
        col("p_user") === dim("user_id") &&
          col("p_us") >= col("valid_from_us") &&
          (col("valid_until_us").isNull || col("p_us") < col("valid_until_us")))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("state_type"), col("island"), col("valid_from_us"), col("p_us"))

  /** Shared sweep-line machinery for q74/q76: each event opens a
    * half-open interval [us, us + dur) with dur = (|⌊value⌋| % 30) + 1
    * minutes; both ±1 markers carry the START's (event_type, day) key so
    * every partition sweeps a complete, self-contained interval set.
    * Tie order (t, delta, event_id) closes before opening at the same
    * microsecond — touching intervals are never concurrent. */
  private def sweepMarkers(s: SparkSession, d: String): DataFrame = {
    val minUs = 60000000L
    val dayUs = 86400000000L
    val iv = Tables.events(s, d)
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (((abs(floor(col("value"))) % 30) + 1) * minUs).as("dur_us"))
      .withColumn("end_us", col("us") + col("dur_us"))
      .withColumn("day", expr(s"us div $dayUs"))
    iv.select(col("event_type"), col("day"), col("us").as("t"),
        lit(1).as("delta"), col("dur_us"), col("event_id"))
      .unionAll(iv.select(col("event_type"), col("day"),
        col("end_us").as("t"), lit(-1).as("delta"), col("dur_us"),
        col("event_id")))
  }

  private def sweepWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy("event_type", "day")
      .orderBy(col("t").asc, col("delta").asc, col("event_id").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Correlated EXISTS through the SQL surface — Catalyst decorrelates
    // to a left semi join (same plan class as q7; the point here is the
    // subquery rewrite, exercised via spark.sql on registered views).
    "q46_exists_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      """)
    }),

    // Unpivot (stack generator): the inverse of q34's pivot — wide
    // per-priority status counts back to long (priority, status, cnt)
    // rows. Pure map-side generator above one aggregation.
    "q47_unpivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
        .select(col("o_orderpriority"),
          expr("stack(3, 'F', n_f, 'O', n_o, 'P', n_p) AS (o_orderstatus, cnt)"))
    }),

    // Value-based RANGE window frame: per customer, rolling 30-day order
    // revenue (frame = orders whose date falls in [current-30d, current]).
    // RANGE frames are value-deterministic — peers (equal dates) share a
    // result regardless of tie order — and the window partitions by
    // customer, never globally.
    "q49_range_frame" -> ((s, d) => {
      val days = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
      val w = Window.partitionBy("o_custkey").orderBy(days)
        .rangeBetween(-30, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          dec(col("o_totalprice")).as("p"))
        .withColumn("rev_30d", sum(col("p")).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("rev_30d"))
    }),

    // The full ranking-function family over one total order
    // (o_totalprice, o_orderkey — unique, so rank == dense_rank == rn and
    // every function is engine-deterministic).
    "q50_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .withColumn("pctr", round(percent_rank().over(w), 6))
        .withColumn("cumd", round(cume_dist().over(w), 6))
        .withColumn("tile", ntile(4).over(w))
        .filter(col("rn") <= 5)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("rk"),
          col("drk"), col("pctr"), col("cumd"), col("tile"))
    }),

    // The scale-safe twin of q16's global ranking: an exact global
    // row_number WITHOUT a single-partition window (see
    // [[globalRowNumber]] for the range-partition + offset machinery,
    // shared with q55's decile bucketing).
    "q54_global_rank_scalable" -> ((s, d) => {
      globalRowNumber(
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"), col("p_retailprice")),
        32, "p_retailprice", firstAsc = false,
        col("p_retailprice").desc, col("p_partkey").asc)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
          col("global_rn"))
    }),

    // Ordered event funnel (view → click → purchase): per user, each step
    // counts only if it happens strictly AFTER the previous step's first
    // completion — the sequential-pattern query behind conversion
    // analytics. Shape: three user-keyed aggregates chained by equi-joins
    // on user_id; each branch scans pruned+filtered columns and
    // partial-aggregates map-side, so only per-user partials shuffle.
    "q58_funnel_steps" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.select(lit(1).as("step"), col("user_id"))
        .unionAll(c.select(lit(2).as("step"), col("user_id")))
        .unionAll(p.select(lit(3).as("step"), col("user_id")))
        .groupBy("step").agg(count(lit(1)).as("n_users"))
    }),

    // Weekly cohort retention: users grouped by first-seen ISO week, each
    // event bucketed by whole-week offset from its user's cohort week —
    // the (cohort × offset) distinct-user matrix. One user-keyed
    // aggregate joined back, then a distinct-count; both shuffles on
    // user_id / small group keys.
    "q59_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).cast("date")
          .as("cohort_week"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          floor(datediff(date_trunc("week", col("ts")).cast("date"),
            col("cohort_week")) / 7).cast("int").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Gap-rule sessionization: assign session INDEXES to events (30-min
    // inactivity closes a session) — the event-level twin of q32's
    // session_window AGGREGATE. Per-user lag + running sum over one
    // user-keyed window; exact epoch-micros arithmetic. At scale both
    // window passes share the single user_id exchange, and per-user state
    // is one row of lookback — no global window anywhere.
    "q60_sessionize" -> ((s, d) => {
      val gapUs = 1800000000L // 30 min in micros
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        // a NULL timestamp cannot be sessionized — and Spark (NULLS
        // FIRST) and DuckDB (NULLS LAST) would order it differently,
        // silently skewing every sess_idx for that user
        .filter(col("us").isNotNull)
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
        .groupBy("user_id", "sess_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    }),

    // Gaps-and-islands / SCD2 run compression: collapse each user's
    // CONSECUTIVE runs of the same event_type into one versioned row
    // (valid_from/valid_to + run length) — the slowly-changing-dimension
    // type-2 build every warehouse runs on change streams, and the
    // classic islands pattern: lag() marks change points, a running sum
    // numbers the islands, one aggregate per island. Shape: both
    // windows and the final groupBy share the user_id partition key —
    // ONE shuffle total at any scale; state per row is two narrow
    // columns. NULL-ts rows are excluded for the q60 ordering reason.
    "q68_value_islands" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .filter(col("us").isNotNull)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("chg"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy("user_id", "island")
        .agg(min(col("event_type")).as("event_type"),
          min(col("us")).as("valid_from_us"),
          max(col("us")).as("valid_to_us"),
          count(lit(1)).as("n_events"))
    }),

    // Winsorization / robust clipping — the ML-preprocessing outlier
    // treatment: per group, clip values at the EXACT p05/p95 order
    // statistics (k = ⌈0.05n⌉ / ⌈0.95n⌉-th smallest, pure integer rank
    // arithmetic — no approx sketch, no interpolation ambiguity) and
    // report the clipped aggregate. Thresholds come from counting-sort
    // order statistics: per-(group, value) counts, a cumulative window
    // over the DISTINCT-VALUE table only, and min(value | cum ≥ k).
    //
    // 100 TB shape: facts fold into the (group, value) count table via
    // one map-side-combined aggregate; the quantile window runs over
    // that table, which for real bounded-domain money values (integer
    // cents) stays ~|domain| rows however large the fact table grows.
    // The 3-row threshold table broadcasts back for the clip pass. On
    // this fixture's synthetic continuous doubles the distinct table is
    // fact-sized, so the window would get the q55-style bucketed-rank
    // swap at scale — the documented trade, same as q70's medians.
    "q73_winsorize" -> ((s, d) => {
      val src = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          dec(col("l_extendedprice")).as("pv"))
      // (grp, value)-count table. NOT checkpointed (r16 opt, measured):
      // all three consumers sit in ONE executed plan whose common tail
      // is the groupBy exchange, so ReuseExchange already shares one
      // evaluation — a checkpoint here replaced the shared exchange
      // with 3× block re-reads (170 MB vs 9 MB) and broke nothing else.
      val counts = src.groupBy("grp", "pv").agg(count(lit(1)).as("c"))
      val cum = counts
        .withColumn("cum", sum(col("c")).over(Window.partitionBy("grp")
          .orderBy(col("pv").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      val th = cum
        .join(counts.groupBy("grp").agg(sum(col("c")).as("n")), "grp")
        .withColumn("k_lo", expr("(n + 19) div 20"))
        .withColumn("k_hi", expr("(19*n + 19) div 20"))
        .groupBy("grp")
        .agg(min(when(col("cum") >= col("k_lo"), col("pv"))).as("lo"),
          min(when(col("cum") >= col("k_hi"), col("pv"))).as("hi"))
      // final pass over the count table, weighted by c — exact decimal
      // arithmetic, identical values to the former per-row re-scan
      counts.join(broadcast(th), "grp")
        .groupBy("grp")
        .agg(sum(col("c")).as("n_rows"),
          min(col("lo")).cast("double").as("p05"),
          min(col("hi")).cast("double").as("p95"),
          sum(least(greatest(col("pv"), col("lo")), col("hi")) * col("c"))
            .cast("double").as("sum_winsorized"),
          sum(when(col("pv") < col("lo"), col("c")).otherwise(0L))
            .as("n_clipped_low"),
          sum(when(col("pv") > col("hi"), col("c")).otherwise(0L))
            .as("n_clipped_high"))
    }),

    // Point-in-time (PIT) join — the feature-store / temporal-warehouse
    // lookup: each fact row joins the SCD2 dimension VERSION that was
    // valid at the fact's own timestamp, never a later one (no feature
    // leakage). Dimension = q68's island compression over the user's
    // non-purchase activity, made half-open via lead(): version v covers
    // [valid_from, next version's valid_from); the last version is
    // open-ended. Facts = purchases. Intervals are disjoint by
    // construction, so every purchase matches at most one version and
    // the join needs no post-dedup.
    //
    // 100 TB shape: one user_id shuffle per side; the range predicate
    // rides the equi-join as a RESIDUAL (the q71 recipe — no time-bucket
    // expansion), and the dimension side is version-COMPRESSED before
    // the join (islands, not raw events), so residual work per user is
    // versions × purchases, both small. An as-of twin via the AsOfJoin
    // strategy would also fit; the residual form is kept because the
    // half-open interval semantics (incl. empty intervals at equal-us
    // boundaries) is explicit in the predicate.
    "q72_pit_join" -> ((s, d) => {
      val facts = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      pitLookup(facts, scd2PitDim(Tables.events(s, d)))
    }),

    // MERGE INTO / upsert semantics (the lakehouse write path, SQL:2003
    // MERGE): a source of per-user latest event values merged into the
    // customer dimension — WHEN MATCHED the balance updates to the
    // event value, WHEN NOT MATCHED BY TARGET the user inserts as a new
    // row, WHEN NOT MATCHED BY SOURCE the customer row carries over.
    // Expressed as compact-latest (q67's shape) + one full outer join
    // with COALESCE/CASE — exactly the plan Delta/Iceberg MERGE lowers
    // to, shuffling both sides once on the merge key. The `action`
    // column makes the three MERGE branches auditable (and the compare
    // total: every target and source row accounted for exactly once).
    "q69_merge_upsert" -> ((s, d) => {
      val wl = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
      val src = Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .withColumn("rn", row_number().over(wl))
        .filter(col("rn") === 1)
        .select(col("user_id").as("key"), col("value").as("src_value"))
      val tgt = Tables.customer(s, d)
        .select(col("c_custkey").as("key"), col("c_acctbal"))
      tgt.join(src, Seq("key"), "full_outer")
        .select(col("key"),
          coalesce(col("src_value"), col("c_acctbal")).as("acctbal"),
          when(col("c_acctbal").isNull, "insert")
            .when(col("src_value").isNull, "keep")
            .otherwise("update").as("action"))
    }),

    // Robust statistics / outlier detection: per-segment MEDIAN and MAD
    // (median absolute deviation) with a 3×MAD outlier count — the
    // data-cleaning screen that survives the heavy tails that break
    // mean/stddev z-scores. Exactness by construction: both medians are
    // ORDER STATISTICS (the lower median, rank (n+1) div 2, tie-broken
    // by o_orderkey) — a picked value, never an interpolation — so the
    // only FP ops are |x − med| (exact IEEE subtraction of identical
    // doubles) and one 3×mad multiply, identical in both engines; no
    // rounding hedge anywhere. Shape: two per-segment rank windows +
    // key-local joins; at 100 TB a skewed segment swaps the window for
    // the two-pass bucketed rank (the q55 NTILE arithmetic) — same
    // picks, no single-reducer sort.
    "q70_mad_outliers" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
          col("o_totalprice").as("x"))
      val w = Window.partitionBy("seg")
      val med = o
        .withColumn("rn", row_number().over(
          w.orderBy(col("x").asc, col("o_orderkey").asc)))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("seg"), col("x").as("med"))
      val dev = o.join(med, Seq("seg"))
        .withColumn("adev", abs(col("x") - col("med")))
      val mad = dev
        .withColumn("rn", row_number().over(
          w.orderBy(col("adev").asc, col("o_orderkey").asc)))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("seg"), col("adev").as("mad"))
      dev.join(mad, Seq("seg"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          min(col("med")).as("median"), min(col("mad")).as("mad"),
          sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    }),

    // Time-bounded attribution join (every purchase ⋈ the same user's
    // clicks within the preceding 30 minutes) — the canonical
    // stream-stream-join workload (ad impression↔conversion), here as
    // the batch anchor for the streaming twin
    // (StreamingJobs.attributionStream, pinned set-equal on a full
    // replay in StreamingSpec). Shape: equi-join on user_id with a
    // range residual — one key shuffle, no time-bucket blowup; micros
    // integer arithmetic end to end so the oracle compares exactly. At
    // scale this is the join whose STREAMING form is the point: the
    // watermark bounds both sides' state to the 30-minute horizon,
    // where the batch form would re-shuffle the full history.
    "q71_attribution" -> ((s, d) => {
      val horizonUs = 1800000000L // 30 min
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("c_us"))
      p.join(c, Seq("user_id"))
        .filter(col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - horizonUs)
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          (col("p_us") - col("c_us")).as("lag_us"))
    }),

    // Time-series resample with gap filling: per-user hourly buckets from
    // the user's first to last event, zero-filled where no events landed
    // — the "regularize an irregular series" operator behind rate
    // dashboards and training-curve alignment. The bucket spine is
    // generated per user (bounded by each user's own active span — never
    // a global calendar cross join), and every join/agg shares the
    // user_id key. DECIMAL sums keep the value column oracle-exact.
    "q61_resample" -> ((s, d) => {
      val hrUs = 3600000000L // 1 h in micros
      val ev = Tables.events(s, d).select(col("user_id"),
        expr(s"unix_micros(ts) div $hrUs").as("hr"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      val perHr = ev.groupBy("user_id", "hr")
        .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sv"))
      val spine = ev.groupBy("user_id")
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"))).as("hr"))
      spine.join(perHr, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0).cast(DecimalType(12, 2)))
            .cast("double").as("sum_value"))
    }),

    // LOCF gap fill (forward fill) over the hourly spine: q61's
    // resample densifies with zeros; this twin carries the LAST
    // OBSERVED value forward across the gaps and reports staleness
    // (hours since the last observation) — the standard feature-
    // engineering treatment of an irregularly-sampled signal before
    // training, where "no reading this hour" means "unchanged", not
    // zero. Per (user, hour) the observed value is the hour's latest
    // event (row_number over us desc, event_id desc — total order, so
    // deterministic); the fill is last(_, ignoreNulls) over the user's
    // hour sequence. One user_id exchange feeds the spine aggregate,
    // the per-hour cut, and the fill window; the spine's first hour is
    // always observed (lo = min observed hour), so no leading nulls.
    // The carried double is copied bit-for-bit — no FP arithmetic.
    // 100 TB shape: windows partition on user_id (millions of keys,
    // bounded per-user history); nothing global, nothing quadratic.
    "q81_gap_fill" -> ((s, d) => {
      val hrUs = 3600000000L // 1 h in micros
      val ev = Tables.events(s, d).select(col("user_id"),
        expr(s"unix_micros(ts) div $hrUs").as("hr"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      val wLast = Window.partitionBy("user_id", "hr")
        .orderBy(col("us").desc, col("event_id").desc)
      val perHr = ev.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("hr"), col("value").as("v_obs"))
      val spine = ev.groupBy("user_id")
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"))).as("hr"))
      val wFill = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(perHr, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          last(col("v_obs"), ignoreNulls = true).over(wFill)
            .as("v_filled"),
          (col("hr") - last(when(col("v_obs").isNotNull, col("hr")),
            ignoreNulls = true).over(wFill)).as("staleness_hr"),
          when(col("v_obs").isNotNull, 1).otherwise(0).as("is_obs"))
    }),

    // Z-order (Morton) clustering key over (customer, order-date): the
    // data-layout operator for multi-dimensional scan pruning at scale —
    // sorting/partitioning 100 TB of orders by zkey co-locates rows close
    // in BOTH dimensions, so either a customer predicate or a date
    // predicate prunes file ranges (a single-column sort can only serve
    // one). The key itself is a pure codegen'd mask-shift cascade (no
    // shuffle); the aggregate here summarizes bucket occupancy — the
    // histogram a table optimizer would persist. Oracle mirrors the
    // cascade step-for-step in BIGINT arithmetic.
    "q56_zorder_key" -> ((s, d) => {
      val days = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
      val zkey = zOrderKey(col("o_custkey"), days.cast("long"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), zkey.as("zkey"))
        .groupBy(shiftright(col("zkey"), 20).as("zbucket"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("zkey")).as("min_zkey"), max(col("zkey")).as("max_zkey"))
    }),

    // Approximate quantiles (the mergeable sketch path next to q38's
    // exact interpolated percentiles): partial sketches combine map-side,
    // so 100 TB needs one pass + a tiny merge instead of a global sort.
    // Approximate ⇒ rows-only; ExtraRelationalSpec pins the estimates
    // against exact order statistics.
    "q57_approx_quantile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_quantity"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          array_join(transform(col("qs"),
            q => q.cast("decimal(12,2)").cast("string")), ",").as("quantiles"))
    }),

    // first/last/nth_value with explicit full-partition frames (the
    // default frame stops at CURRENT ROW — a classic last_value trap,
    // made explicit here on both engines).
    "q53_first_last" -> ((s, d) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .withColumn("first_price", first(col("o_totalprice")).over(full))
        .withColumn("last_price", last(col("o_totalprice")).over(full))
        .withColumn("second_price",
          nth_value(col("o_totalprice"), 2).over(full))
        .withColumn("rn", row_number().over(ord))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("first_price"), col("last_price"),
          col("second_price"))
    }),

    // CEP-lite sequence-pattern matching (the MATCH_RECOGNIZE / funnel-
    // regex workload, SQL:2016 row pattern recognition): each session's
    // ordered event-type sequence is folded to a compact initials
    // string ('vcvp…'), and row patterns become plain REGEXES over it —
    // 'did a view→click→purchase funnel complete within one session',
    // 'did an error repeat', 'was a purchase made blind (no prior
    // view)', single-event bounces. Spark has no MATCH_RECOGNIZE; this
    // is the Spark-first reduction: sessionize (q60's gap logic), ONE
    // ordered fold per session, then regex — all four patterns answered
    // by one conditional aggregate over the session strings.
    //
    // 100 TB shape: one user_id shuffle total — the session window, the
    // per-session fold, and the string build all share the user_id
    // partition; pattern evaluation is a scan over session strings
    // whose length is bounded by session size, never corpus size. The
    // regex dialect is the Java/RE2 common subset (.* [^x] ^ $), so the
    // DuckDB oracle evaluates the same patterns.
    "q77_event_pattern" -> ((s, d) => {
      val gapUs = 1800000000L
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      val sess = Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          substring(col("event_type"), 1, 1).as("c"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sess", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val strs = sess.groupBy("user_id", "sess")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("us"), col("event_id"),
            col("c")))),
          x => x.getField("c")), "").as("seq"))
      def hits(re: String): Column =
        sum(when(col("seq").rlike(re), 1L).otherwise(0L))
      strs.agg(count(lit(1)).as("n_sessions"),
        hits("v.*c.*p").as("n_funnel"),
        hits("e.*e").as("n_error_retry"),
        hits("^[^v]*p").as("n_blind_buy"),
        hits("^.$").as("n_bounce"))
    }),

    // Skyline / Pareto frontier (Börzsönyi et al., ICDE 2001): parts not
    // dominated on (minimize retail price, maximize size) — the
    // multi-criteria shortlist operator ("no part is both cheaper and
    // larger"). The naive formulation is an O(n²) NOT-EXISTS self-join;
    // the 2-D frontier is instead a SORT: after ordering by price, a
    // part is on the frontier iff its size beats every strictly-cheaper
    // part's max size (running max) and it tops its own price group.
    //
    // 100 TB shape: the q54 bucket idiom makes the global order scale —
    // in-plan percentile_approx price buckets (shape balance only,
    // never correctness), per-bucket RANGE windows,
    // and a ≤nParts-row per-bucket-max table whose running max is
    // broadcast back. No global single-partition window, no n² join;
    // one narrow 3-column shuffle by price bucket.
    "q78_skyline" -> ((s, d) => {
      val nParts = 32
      val base = Tables.part(s, d).select(col("p_partkey"),
        (col("p_retailprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("price_c"),
        col("p_size").cast("long").as("size"))
      val probs = (1 until nParts).map(_.toDouble / nParts).toArray
      // boundaries in-plan (same lazy idiom as globalRowNumber): one
      // percentile_approx aggregate, broadcast onto every row; bucket =
      // #boundaries strictly below price — monotone, shape-only
      val boundsRow = base.agg(array_sort(array_distinct(
        percentile_approx(col("price_c"), typedLit(probs), lit(100))))
        .as("__bnds"))
      val bk = base.crossJoin(broadcast(boundsRow))
        .withColumn("__bk",
          size(filter(col("__bnds"), b => col("price_c") > b)))
        .drop("__bnds")
      val byPrice = Window.partitionBy("__bk").orderBy(col("price_c"))
      // strict predecessors inside the bucket: price is integer cents, so
      // RANGE [unbounded, -1] is exactly "strictly cheaper"
      val wStrict = byPrice.rangeBetween(Window.unboundedPreceding, -1)
      // RANGE [0, 0] = the current price group (peers)
      val wPeers = byPrice.rangeBetween(0, 0)
      // bucket boundaries are value-based, so every row in an earlier
      // bucket is STRICTLY cheaper: its max size folds into the strict
      // predecessor max. ≤ nParts rows — window + broadcast are free.
      val wB = Window.orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pre = bk.groupBy("__bk").agg(max("size").as("__bmx"))
        .withColumn("__pre", max(col("__bmx")).over(wB))
        .select("__bk", "__pre")
      bk.join(broadcast(pre), "__bk")
        .withColumn("__m1",
          greatest(max(col("size")).over(wStrict), col("__pre")))
        .withColumn("__m2", max(col("size")).over(wPeers))
        .filter((col("__m1").isNull || col("size") > col("__m1")) &&
          col("size") === col("__m2"))
        .select(col("p_partkey"), col("price_c"), col("size"))
    }),

    // Array-membership join: orders whose basket (the array of distinct
    // brands they contain) hits a watchlist — "exposure per watched
    // brand". This is the hand-written EXPLODE + equi-join shape that
    // graft.plans.RewriteArrayContainsJoin produces from the
    // declarative `join(watch, array_contains($"tags", $"brand"))`
    // spelling (registered queries run without session extensions, so
    // the scale-correct form is spelled out; ExtensionsStatefulSpec
    // pins that the declarative form plans to exactly this).
    //
    // 100 TB shape: the basket array (bounded by order size) is built
    // by ONE l_orderkey aggregate and never crosses another wire — the
    // explode emits narrow (l_orderkey, brand) pairs and the watchlist
    // (≤ brand vocabulary) broadcasts. The naive array_contains join
    // is a BroadcastNestedLoopJoin evaluating |orders|·|watch|
    // conditions; this is O(Σ|basket|) + a broadcast hash probe.
    "q80_tag_join" -> ((s, d) => {
      val baskets = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("p_brand")).as("tags"))
      val watch = Tables.part(s, d).filter(col("p_size") === 50)
        .select(col("p_brand").as("brand")).distinct()
      baskets
        .select(col("l_orderkey"), explode(col("tags")).as("brand"))
        .join(broadcast(watch), Seq("brand"))
        .groupBy(col("brand")).agg(count(lit(1)).as("n_orders"))
    }),

    // Peak interval concurrency via the sweep line — "max simultaneous
    // sessions/streams/calls", the capacity-planning aggregate. Each
    // event opens a half-open interval [start, start + dur) (duration
    // derived deterministically from `value`, 1–30 min); the sweep turns
    // every interval into a +1/−1 marker pair, one running sum counts
    // live intervals, max() takes the peak. Exact and O(n log n) — the
    // naive self-join "pairs that overlap" is O(n²) and can't even
    // express the k-way peak.
    //
    // 100 TB shape: markers double the rows but carry 4 narrow columns;
    // the only shuffle is the (event_type, day) window partition. The
    // day key makes partitions calendar-bounded (no single per-type
    // reducer eating years of data): peak is per (type, start-day),
    // intervals credited to the day they START (well-defined — every
    // group sweeps a complete, self-contained interval set; a cross-day
    // carry would need q54's two-pass offset trick, the documented
    // extension). Tie order (t, delta, event_id) closes intervals before
    // opening at the same microsecond, so touching ≠ concurrent.
    "q74_concurrency" -> ((s, d) => {
      sweepMarkers(s, d)
        .withColumn("conc", sum(col("delta"))
          .over(sweepWindow.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("event_type", "day")
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L))
          .as("n_intervals"),
          max(col("conc")).cast("long").as("peak"))
    }),

    // Interval-union coverage — the same sweep line answering the OTHER
    // capacity question: how much wall-clock was covered by ≥1 live
    // interval (utilization / SLA uptime), vs the gross sum of interval
    // lengths (their difference = time saved by overlap). Between two
    // consecutive markers the live count is constant, so covered time
    // = Σ gap lengths where the running count > 0 — exact integer
    // micros, no pairwise overlap decomposition. Same (event_type, day)
    // partitioning and scale shape as q74.
    "q76_interval_coverage" -> ((s, d) => {
      val w = sweepWindow
      sweepMarkers(s, d)
        .withColumn("conc", sum(col("delta"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("next_t", lead(col("t"), 1).over(w))
        .withColumn("covered",
          when(col("conc") > 0 && col("next_t").isNotNull,
            col("next_t") - col("t")).otherwise(0L))
        .groupBy("event_type", "day")
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L))
          .as("n_intervals"),
          sum(col("covered")).as("covered_us"),
          sum(when(col("delta") === 1, col("dur_us")).otherwise(0L))
            .as("gross_us"))
    }),

    // Hierarchy closure + subtree rollup — the BOM explosion /
    // org-chart aggregate. The part table is read as an implicit binary
    // hierarchy (parent(k) = k div 2, root = 1); each part's ancestor
    // chain produces the (part, ancestor) closure, then one aggregate
    // per ancestor rolls up subtree size and DECIMAL-exact subtree
    // value, plus each node's own depth. The closure is n·log n rows of
    // three narrow columns and folds into the rollup via one
    // map-side-combined aggregate. Through round 16 the chain was
    // climbed with the RECURSIVE CTE surface (SQL:1999; Spark 4's
    // UnionLoop operator, job-per-level); since the parent function is
    // CLOSED-FORM (ancestor i of k = k >> i), round 17 expands the
    // chain in one bounded projection instead — identical closure, no
    // per-level driver loop (see the query note below). The DuckDB
    // oracle keeps the recursive-CTE formulation.
    "q75_hier_rollup" -> ((s, d) => {
      // Temp view on a CHILD session (same SparkContext; separate
      // temp-view catalog) so the shared session's catalog stays clean.
      val qs = s.newSession()
      Tables.part(qs, d).createOrReplaceTempView("part")
      // nodes are 1-based (pk1 = p_partkey + 1): parent(1) would be
      // undefined for a 0 key, whose chain could never reach the root
      // ONE pass over the recursive closure (r16 opt): depth (per pk1)
      // and rollup (per node) previously aggregated `anc` separately,
      // and each reference re-ran the whole ~log₂n-level UnionLoop —
      // measured 72 jobs at sf0.1. GROUPING SETS computes both keyings
      // from a single evaluation of the loop (Expand doubles the closure
      // rows once, far cheaper than re-recursing); the emitted values
      // are bit-identical to the two-aggregate form.
      //
      // Bounded-depth closure (r17 opt, VERDICT item 7): the recursion
      // `node → node DIV 2 while node > 1` over 1-based keys is, row
      // for row, the bit-shift chain pk1 >> i for i = 0..⌊log₂ pk1⌋
      // (DIV 2 on a non-negative long IS an arithmetic right shift, so
      // the i-th recursion level emits exactly pk1 >> i, and the loop
      // stops after emitting 1). One explode of that statically-bounded
      // chain (≤ 63 levels covers every positive long — the engine-
      // independent depth cap the recursive form enforced via
      // cteRecursionLevelLimit) produces the identical (pk1, price,
      // node) closure in ONE projection: the UnionLoop's job-per-level
      // driver loop (38 jobs at sf0.1, ~half of them per-level
      // emptiness checks) collapses to a single map pass, and the 1M-row
      // recursion safety-net override the UnionLoop needed at sf1
      // disappears with the loop. The DuckDB oracle still runs the
      // recursive-CTE formulation, so the closure semantics stay pinned
      // cross-engine; oracle hash-exact at sf0.01 AND sf0.1.
      qs.sql("""
        WITH anc AS (
          SELECT p_partkey + 1 AS pk1,
                 CAST(p_retailprice AS DECIMAL(12,2)) AS price,
                 node
          FROM part
          LATERAL VIEW explode(filter(transform(sequence(0, 62),
            i -> shiftright(p_partkey + 1, i)), x -> x >= 1)) AS node
        ),
        agg AS (
          SELECT COALESCE(pk1, node) AS nd, pk1 IS NOT NULL AS is_depth,
                 COUNT(*) AS c, CAST(SUM(price) AS DOUBLE) AS sp
          FROM anc GROUP BY GROUPING SETS ((pk1), (node))
        )
        SELECT nd AS node,
               CAST(MAX(CASE WHEN is_depth THEN c - 1 END) AS BIGINT)
                 AS depth,
               MAX(CASE WHEN NOT is_depth THEN c END) AS subtree_n,
               MAX(CASE WHEN NOT is_depth THEN sp END) AS subtree_value
        FROM agg GROUP BY nd
        HAVING MAX(CASE WHEN is_depth THEN c END) IS NOT NULL
           AND MAX(CASE WHEN NOT is_depth THEN c END) IS NOT NULL
      """)
    }))

  val oracles: Map[String, String] = Map(
    // comparisons run on epoch_us like q36: Spark's events table truncates
    // the parquet nanos to micros, so the oracle must gate steps at micro
    // resolution too — raw TIMESTAMP_NS comparison could admit a click in
    // the same microsecond but a later nanosecond that Spark rejects
    "q58_funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |  GROUP BY e.user_id)
        |SELECT step, COUNT(*) AS n_users FROM (
        |  SELECT 1 AS step, user_id FROM v
        |  UNION ALL SELECT 2, user_id FROM c
        |  UNION ALL SELECT 3, user_id FROM p)
        |GROUP BY step""".stripMargin,
    "q59_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)
        |    AS cohort_week
        |  FROM events GROUP BY user_id)
        |SELECT f.cohort_week,
        |  CAST(FLOOR(date_diff('day', f.cohort_week,
        |    CAST(date_trunc('week', e.ts) AS DATE)) / 7.0) AS INTEGER)
        |    AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q56_zorder_key" ->
      """WITH base AS (
        |  SELECT o_orderkey, (o_custkey & 65535) AS x,
        |    (date_diff('day', DATE '1970-01-01', o_orderdate) & 65535) AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey,
        |  ((x | (x << 8)) & 16711935) AS x,
        |  ((y | (y << 8)) & 16711935) AS y FROM base),
        |s2 AS (SELECT o_orderkey,
        |  ((x | (x << 4)) & 252645135) AS x,
        |  ((y | (y << 4)) & 252645135) AS y FROM s1),
        |s3 AS (SELECT o_orderkey,
        |  ((x | (x << 2)) & 858993459) AS x,
        |  ((y | (y << 2)) & 858993459) AS y FROM s2),
        |s4 AS (SELECT o_orderkey,
        |  ((x | (x << 1)) & 1431655765) AS x,
        |  ((y | (y << 1)) & 1431655765) AS y FROM s3),
        |z AS (SELECT o_orderkey, (x | (y << 1)) AS zkey FROM s4)
        |SELECT (zkey >> 20) AS zbucket, COUNT(*) AS n_orders,
        |  MIN(zkey) AS min_zkey, MAX(zkey) AS max_zkey
        |FROM z GROUP BY zbucket""".stripMargin,
    "q46_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
    "q47_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'F' AS o_orderstatus, n_f AS cnt FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'O', n_o FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'P', n_p FROM wide""".stripMargin,
    "q49_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS rev_30d
        |FROM orders""".stripMargin,
    "q50_rank_family" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |  CAST(RANK() OVER w AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pctr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cumd,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS tile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY rn <= 5""".stripMargin,
    "q60_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT user_id, event_id, us,
        |  CASE WHEN LAG(us) OVER w IS NULL
        |         OR us - LAG(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY us ASC, event_id ASC)),
        |g AS (SELECT user_id, us,
        |  CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY us ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
        |    AS sess_idx
        |  FROM f)
        |SELECT user_id, sess_idx, COUNT(*) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q61_resample" ->
      """WITH e AS (SELECT user_id,
        |  epoch_us(ts) // 3600000000 AS hr,
        |  CAST(value AS DECIMAL(12,2)) AS v FROM events),
        |p AS (SELECT user_id, hr, COUNT(*) AS n_events, SUM(v) AS sv
        |  FROM e GROUP BY 1, 2),
        |s AS (SELECT user_id, unnest(generate_series(lo, hi)) AS hr
        |  FROM (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
        |        FROM e GROUP BY user_id))
        |SELECT s.user_id, s.hr,
        |  COALESCE(p.n_events, 0) AS n_events,
        |  CAST(COALESCE(p.sv, 0) AS DOUBLE) AS sum_value
        |FROM s LEFT JOIN p
        |  ON s.user_id = p.user_id AND s.hr = p.hr""".stripMargin,
    "q81_gap_fill" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) // 3600000000 AS hr,
        |    epoch_us(ts) AS us, event_id, value FROM events),
        |p AS (SELECT user_id, hr, value AS v_obs FROM (
        |    SELECT user_id, hr, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, hr
        |        ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |s AS (SELECT user_id, unnest(generate_series(lo, hi)) AS hr
        |  FROM (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
        |        FROM e GROUP BY user_id)),
        |j AS (SELECT s.user_id, s.hr, p.v_obs
        |  FROM s LEFT JOIN p
        |    ON s.user_id = p.user_id AND s.hr = p.hr)
        |SELECT user_id, hr,
        |  LAST_VALUE(v_obs IGNORE NULLS) OVER w AS v_filled,
        |  hr - LAST_VALUE(CASE WHEN v_obs IS NOT NULL THEN hr END
        |    IGNORE NULLS) OVER w AS staleness_hr,
        |  CASE WHEN v_obs IS NOT NULL THEN 1 ELSE 0 END AS is_obs
        |FROM j
        |WINDOW w AS (PARTITION BY user_id ORDER BY hr
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q70_mad_outliers" ->
      """WITH o AS (SELECT c_mktsegment AS seg, o_orderkey, o_totalprice AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |rk AS (SELECT seg, o_orderkey, x,
        |  ROW_NUMBER() OVER (PARTITION BY seg
        |    ORDER BY x ASC, o_orderkey ASC) AS rn,
        |  COUNT(*) OVER (PARTITION BY seg) AS n FROM o),
        |med AS (SELECT seg, x AS med FROM rk WHERE rn = (n + 1) // 2),
        |dev AS (SELECT o.seg, o.o_orderkey, o.x, m.med,
        |  ABS(o.x - m.med) AS adev FROM o JOIN med m USING (seg)),
        |mrk AS (SELECT seg, adev,
        |  ROW_NUMBER() OVER (PARTITION BY seg
        |    ORDER BY adev ASC, o_orderkey ASC) AS rn,
        |  COUNT(*) OVER (PARTITION BY seg) AS n FROM dev),
        |mad AS (SELECT seg, adev AS mad FROM mrk WHERE rn = (n + 1) // 2)
        |SELECT d.seg, COUNT(*) AS n, MIN(d.med) AS median,
        |  MIN(md.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.adev > CAST(3 AS DOUBLE) * md.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad md USING (seg)
        |GROUP BY d.seg""".stripMargin,
    "q71_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM events p JOIN events c ON c.user_id = p.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000""".stripMargin,
    "q68_value_islands" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT user_id, event_id, event_type, us,
        |  CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY us ASC, event_id ASC) IS NULL
        |         OR LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY us ASC, event_id ASC) <> event_type
        |       THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |i AS (SELECT user_id, event_id, event_type, us,
        |  SUM(chg) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  MIN(event_type) AS event_type,
        |  MIN(us) AS valid_from_us, MAX(us) AS valid_to_us,
        |  COUNT(*) AS n_events
        |FROM i GROUP BY user_id, island""".stripMargin,
    "q73_winsorize" ->
      """WITH src AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS pv
        |  FROM lineitem),
        |counts AS (SELECT grp, pv, COUNT(*) AS c FROM src GROUP BY 1, 2),
        |cum AS (SELECT grp, pv, c,
        |    SUM(c) OVER (PARTITION BY grp ORDER BY pv ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM counts),
        |ns AS (SELECT grp, SUM(c) AS n FROM counts GROUP BY 1),
        |th AS (
        |  SELECT cum.grp,
        |    MIN(CASE WHEN cum >= (n + 19) // 20 THEN pv END) AS lo,
        |    MIN(CASE WHEN cum >= (19*n + 19) // 20 THEN pv END) AS hi
        |  FROM cum JOIN ns ON ns.grp = cum.grp
        |  GROUP BY 1)
        |SELECT src.grp, COUNT(*) AS n_rows,
        |  CAST(MIN(lo) AS DOUBLE) AS p05,
        |  CAST(MIN(hi) AS DOUBLE) AS p95,
        |  -- CASE, not LEAST/GREATEST: DuckDB's LEAST/GREATEST cast
        |  -- DECIMAL args to DOUBLE, which would sum with FP error
        |  CAST(SUM(CASE WHEN pv < lo THEN lo WHEN pv > hi THEN hi ELSE pv END)
        |       AS DOUBLE) AS sum_winsorized,
        |  CAST(SUM(CASE WHEN pv < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN pv > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
        |FROM src JOIN th ON th.grp = src.grp
        |GROUP BY 1""".stripMargin,
    "q72_pit_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE ts IS NOT NULL AND event_type <> 'purchase'),
        |m AS (SELECT user_id, event_id, event_type, us,
        |  CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY us ASC, event_id ASC) IS NULL
        |         OR LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY us ASC, event_id ASC) <> event_type
        |       THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |i AS (SELECT user_id, event_id, event_type, us,
        |  SUM(chg) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m),
        |v AS (SELECT user_id, CAST(island AS BIGINT) AS island,
        |    MIN(event_type) AS state_type, MIN(us) AS valid_from_us
        |  FROM i GROUP BY user_id, island),
        |dim AS (SELECT user_id, island, state_type, valid_from_us,
        |    LEAD(valid_from_us) OVER (PARTITION BY user_id
        |      ORDER BY valid_from_us ASC, island ASC) AS valid_until_us
        |  FROM v),
        |f AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
        |SELECT f.purchase_id, f.user_id, dim.state_type, dim.island,
        |  dim.valid_from_us, f.p_us
        |FROM f JOIN dim ON dim.user_id = f.user_id
        |  AND f.p_us >= dim.valid_from_us
        |  AND (dim.valid_until_us IS NULL OR f.p_us < dim.valid_until_us)""".stripMargin,
    "q69_merge_upsert" ->
      """WITH src AS (SELECT user_id AS key, value AS src_value FROM (
        |  SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE ts IS NOT NULL) WHERE rn = 1),
        |tgt AS (SELECT c_custkey AS key, c_acctbal FROM customer)
        |SELECT COALESCE(t.key, s.key) AS key,
        |  COALESCE(s.src_value, t.c_acctbal) AS acctbal,
        |  CASE WHEN t.c_acctbal IS NULL THEN 'insert'
        |       WHEN s.src_value IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM tgt t FULL OUTER JOIN src s ON t.key = s.key""".stripMargin,
    "q54_global_rank_scalable" ->
      """SELECT p_partkey, p_name, p_retailprice,
        |  ROW_NUMBER() OVER (ORDER BY p_retailprice DESC, p_partkey ASC)
        |    AS global_rn
        |FROM part""".stripMargin,
    "q53_first_last" ->
      """WITH x AS (
        |  SELECT o_custkey,
        |    FIRST_VALUE(o_totalprice) OVER f AS first_price,
        |    LAST_VALUE(o_totalprice) OVER f AS last_price,
        |    NTH_VALUE(o_totalprice, 2) OVER f AS second_price,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders
        |  WINDOW f AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate ASC, o_orderkey ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT o_custkey, first_price, last_price, second_price
        |FROM x WHERE rn = 1""".stripMargin,
    "q74_concurrency" ->
      """WITH iv AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS us,
        |    ((abs(CAST(floor(value) AS BIGINT)) % 30) + 1) AS dur_min
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |iv2 AS (SELECT event_id, event_type, us,
        |    us + dur_min * 60000000 AS end_us,
        |    us // 86400000000 AS day FROM iv),
        |m AS (
        |  SELECT event_type, day, us AS t, 1 AS delta, event_id FROM iv2
        |  UNION ALL
        |  SELECT event_type, day, end_us, -1, event_id FROM iv2),
        |c AS (SELECT event_type, day, delta,
        |  SUM(delta) OVER (PARTITION BY event_type, day
        |    ORDER BY t ASC, delta ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM m)
        |SELECT event_type, day,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_intervals,
        |  CAST(MAX(conc) AS BIGINT) AS peak
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q77_event_pattern" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    substr(event_type, 1, 1) AS c
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT user_id, event_id, us, c,
        |    CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY us ASC, event_id ASC)),
        |g AS (SELECT user_id, c, us, event_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f),
        |strs AS (SELECT user_id, sess,
        |    string_agg(c, '' ORDER BY us ASC, event_id ASC) AS seq
        |  FROM g GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_funnel,
        |  CAST(SUM(CASE WHEN regexp_matches(seq, 'e.*e') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error_retry,
        |  CAST(SUM(CASE WHEN regexp_matches(seq, '^[^v]*p') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_blind_buy,
        |  CAST(SUM(CASE WHEN regexp_matches(seq, '^.$') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_bounce
        |FROM strs""".stripMargin,
    "q78_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS price_c,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |w AS (
        |  SELECT p_partkey, price_c, size,
        |    MAX(size) OVER (ORDER BY price_c
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
        |    MAX(size) OVER (PARTITION BY price_c) AS m2
        |  FROM p)
        |SELECT p_partkey, price_c, size FROM w
        |WHERE (m1 IS NULL OR size > m1) AND size = m2""".stripMargin,
    "q80_tag_join" ->
      """WITH baskets AS (
        |  SELECT l_orderkey, list_distinct(list(p_brand)) AS tags
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |watch AS (
        |  SELECT DISTINCT p_brand AS brand FROM part WHERE p_size = 50)
        |SELECT w.brand, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM baskets b JOIN watch w ON list_contains(b.tags, w.brand)
        |GROUP BY 1""".stripMargin,
    "q76_interval_coverage" ->
      """WITH iv AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS us,
        |    ((abs(CAST(floor(value) AS BIGINT)) % 30) + 1) * 60000000 AS dur_us
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |iv2 AS (SELECT event_id, event_type, us, dur_us,
        |    us + dur_us AS end_us,
        |    us // 86400000000 AS day FROM iv),
        |m AS (
        |  SELECT event_type, day, us AS t, 1 AS delta, dur_us, event_id
        |  FROM iv2
        |  UNION ALL
        |  SELECT event_type, day, end_us, -1, dur_us, event_id FROM iv2),
        |c AS (SELECT event_type, day, delta, dur_us,
        |  SUM(delta) OVER w AS conc,
        |  LEAD(t) OVER w - t AS gap
        |  FROM m WINDOW w AS (PARTITION BY event_type, day
        |    ORDER BY t ASC, delta ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, day,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_intervals,
        |  CAST(SUM(CASE WHEN conc > 0 AND gap IS NOT NULL
        |    THEN gap ELSE 0 END) AS BIGINT) AS covered_us,
        |  CAST(SUM(CASE WHEN delta = 1 THEN dur_us ELSE 0 END) AS BIGINT)
        |    AS gross_us
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q75_hier_rollup" ->
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey + 1 AS pk1,
        |    CAST(p_retailprice AS DECIMAL(12,2)) AS price,
        |    p_partkey + 1 AS node
        |  FROM part
        |  UNION ALL
        |  SELECT pk1, price, node // 2 AS node
        |  FROM anc WHERE node > 1),
        |depth AS (
        |  SELECT pk1 AS node, COUNT(*) - 1 AS depth
        |  FROM anc GROUP BY pk1),
        |roll AS (
        |  SELECT node, COUNT(*) AS subtree_n,
        |    CAST(SUM(price) AS DOUBLE) AS subtree_value
        |  FROM anc GROUP BY node)
        |SELECT r.node, CAST(d.depth AS BIGINT) AS depth,
        |  r.subtree_n, r.subtree_value
        |FROM roll r JOIN depth d ON d.node = r.node""".stripMargin)
}
