package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational breadth over the TPC-H-ish fixtures (SURVEY.md §2.2 — the
  * operator categories absent from the reference that the engine provides
  * via stock Catalyst). Every query here is pure DataFrame API (or
  * `spark.sql` where the DataFrame API lacks the construct), each with an
  * exact DuckDB oracle.
  *
  * Numeric-determinism rule: any aggregate over a double column goes
  * through `DECIMAL` so the sum is exact (order-independent) and therefore
  * bit-identical across engines; the final value is cast back to double.
  * Raw column passthrough is inherently exact.
  *
  * Scale notes are inline per query — the fixture is small, but each plan
  * is shaped for the 100 TB case (broadcast dims, partial aggregation,
  * no driver materialization, windows over union instead of join
  * explosion for as-of).
  */
object RelationalQueries {

  /** Exact-decimal view of a money/quantity double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private val oneD = lit(1).cast(DecimalType(12, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation ----------------------------------------------------
    // TPC-H Q1 shape: scan-heavy multi-aggregate with partial aggregation
    // before the (tiny, 6-group) shuffle. At 100 TB this is bandwidth-bound
    // on the parquet scan; the filter and the 6-column projection both push
    // into the scan.
    "q1_pricing_summary" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (oneD - dec(col("l_discount")))
            * (oneD + dec(col("l_tax")))).cast("double").as("sum_charge"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6)
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q6 shape: selective predicates all pushed to the scan.
    "q6_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    "q12_distinct_agg" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"),
          count(lit(1)).as("n_rows"))
    }),

    "q13_rollup" -> ((s, d) => {
      Tables.lineitem(s, d).rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    "q14_cube" -> ((s, d) => {
      Tables.orders(s, d).cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
    }),

    // grouping sets via the SQL surface (also exercises spark.sql).
    "q15_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       COUNT(*) AS n_orders
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |""".stripMargin)
    }),

    "q18_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d).agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        sum(when(col("o_orderpriority") === "1-URGENT",
          dec(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
          .cast("double").as("urgent_price"))
    }),

    // ---- joins ----------------------------------------------------------
    // dim-chain: nation & region are tiny -> broadcast both; no shuffle of
    // the customer side at all.
    "q3_customers_per_region" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
    }),

    // fact-fact join: orders ⋈ lineitem shuffles on the join key; partial
    // aggregation happens below the join's exchange on the lineitem side is
    // not possible (group key is on orders), so this is the canonical
    // shuffle-join benchmark. AQE picks SMJ/SHJ at scale.
    "q4_revenue_by_priority" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
            .as("disc_price"))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("disc_price")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // 5-way join: two big facts + customer, with broadcast dims on top.
    "q5_revenue_by_nation" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d).select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
          .as("disc_price"))
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(col("disc_price")).cast("double").as("revenue"))
    }),

    "q7_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    "q8_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    "q28_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
      val su = Tables.supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(su, c("c_nationkey") === su("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
    }),

    // part ⋈ lineitem with a broadcastable build side at any realistic SF
    // ratio (part is ~1/3 the rows of lineitem here but selective filter
    // first makes it small).
    "q19_brand_revenue" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_size") <= 15)
        .select("p_partkey", "p_brand")
      val l = Tables.lineitem(s, d).select(col("l_partkey"),
        (dec(col("l_extendedprice")) * (oneD - dec(col("l_discount"))))
          .as("disc_price"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(col("disc_price")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- subqueries -----------------------------------------------------
    "q20_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val threshold = o.agg((max(dec(col("o_totalprice"))) / 2).cast("double")
        .as("t"))
      o.join(broadcast(threshold))
        .filter(col("o_totalprice") > col("t"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    "q21_having" -> ((s, d) => {
      Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .filter(col("n_orders") >= 15)
    }),

    // ---- set ops --------------------------------------------------------
    "q22_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
      f.intersect(p)
    }),

    "q23_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
      val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
      p.except(f)
    }),

    "q24_union_distinct" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val hi = c.filter(col("c_acctbal") > 9000).select("c_custkey")
      val seg = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      hi.union(seg).distinct()
    }),

    // ---- sort / limit ---------------------------------------------------
    // top-k: Catalyst plans TakeOrderedAndProject — a per-partition heap +
    // driver merge of k rows, no global sort. Deterministic tie-break.
    "q11_top_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(50)
    }),

    // ---- window functions -----------------------------------------------
    "q9_rank_orders_per_customer" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    "q10_running_sum" -> ((s, d) => {
      // order must be TOTAL within the partition or running values are
      // tie-order-dependent: (l_orderkey, l_linenumber) is NOT unique in
      // the synthetic lineitem — adding partkey+extendedprice makes the
      // sort key a verified unique tuple at every SF
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_extendedprice"))
      Tables.lineitem(s, d)
        .withColumn("running_qty",
          sum(dec(col("l_quantity")))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .withColumn("prev_qty",
          lag(col("l_quantity"), 1).over(w))
        .withColumn("moving3_qty",
          sum(dec(col("l_quantity"))).over(w.rowsBetween(-2, 0))
            .cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
          "running_qty", "prev_qty", "moving3_qty")
    }),

    "q16_dense_rank_global" -> ((s, d) => {
      // percentile-style ranking across the whole table: single-partition
      // window — fine for dim tables; for facts prefer partitioned windows
      // (documented anti-pattern otherwise).
      val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      Tables.supplier(s, d)
        .withColumn("rank_bal", dense_rank().over(w))
        .withColumn("ntile4", ntile(4).over(w))
        .select("s_suppkey", "s_name", "s_acctbal", "rank_bal", "ntile4")
    }),

    // ---- scalar functions ----------------------------------------------
    "q17_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 3).as("type_prefix"),
          regexp_replace(col("p_brand"), "#", "_").as("brand_clean"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"))
        .filter(col("p_name").like("%a%"))
    }),

    "q25_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
    }),

    "q26_date_trunc" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("quarter", col("o_orderdate")).as("o_quarter"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
    }),

    // ---- events: json + time windows ------------------------------------
    // Spark 4 VARIANT: parse once into the binary semi-structured type,
    // then typed-path extraction — the shredded/columnar successor to
    // per-access get_json_object string re-parsing (q27's shape). At
    // scale the parse happens once per row and variant_get is a typed
    // byte-offset walk, not a JSON scan. Oracle extracts the same path
    // from the raw JSON text.
    "q63_variant_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          // try_: malformed JSON becomes NULL (dropped by the typed
          // extraction) instead of failing the job — RobustnessSpec
          try_parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"))
    }),

    "q27_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
    }),

    // tumbling window — batch mode `window()`: the exact construct reused
    // by the streaming path (streaming/StreamingWordCount).
    "q30_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    "q31_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("n"))
    }),

    "q32_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
    }),

    // as-of join, Spark-first: instead of an exploding inequality join,
    // union the two event streams and carry the last click forward with a
    // running window — one shuffle on user_id, linear work, scales to any
    // size. (DuckDB oracle uses a correlated subquery for the same
    // semantics: most recent click at-or-before each error.)
    "q33_asof_last_click" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select("user_id", "ts", "event_id", "event_type")
      // order clicks before errors at identical ts ('click' < 'error')
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_type"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "last_click_ts")
    }),

    // pivot: day × event_type counts.
    "q34_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
    }))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q18_conditional_agg" ->
      """SELECT
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN CAST(o_totalprice AS DECIMAL(12,2))
        |       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent_price
        |FROM orders""".stripMargin,
    "q3_customers_per_region" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q4_revenue_by_priority" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q28_full_outer" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
        |       COALESCE(c.n_customers, 0) AS n_customers,
        |       COALESCE(s.n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey""".stripMargin,
    "q19_brand_revenue" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 15 GROUP BY p_brand""".stripMargin,
    "q20_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) / 2 AS DOUBLE) FROM orders)""".stripMargin,
    "q21_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin,
    "q22_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "q23_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q24_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q11_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "q9_rank_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q10_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_qty,
        |  LAG(l_quantity, 1) OVER w AS prev_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q16_dense_rank_global" ->
      """SELECT s_suppkey, s_name, s_acctbal,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS rank_bal,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS ntile4
        |FROM supplier
        |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)""".stripMargin,
    "q17_string_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_upper,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  SUBSTRING(p_type, 1, 3) AS type_prefix,
        |  REGEXP_REPLACE(p_brand, '#', '_', 'g') AS brand_clean,
        |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
        |  LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
        |FROM part WHERE p_name LIKE '%a%'""".stripMargin,
    "q25_date_funcs" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q26_date_trunc" ->
      """SELECT DATE_TRUNC('quarter', o_orderdate) AS o_quarter,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q63_variant_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(CAST(props->>'k' AS BIGINT)) AS min_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q27_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q30_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q31_sliding_window" ->
      """SELECT window_start, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS window_start FROM events
        |) GROUP BY 1""".stripMargin,
    // session gaps measured at MICRO resolution (epoch_us): Spark sees
    // micro-truncated timestamps, and a raw nanos gap within 1µs of the
    // 30-minute threshold could split sessions differently (same hazard
    // class as q33/q36/q58). Tie order among equal-micro events cannot
    // matter: a zero diff never starts a session.
    "q32_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |              OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
        |              >= 1800000000
        |         OR LAG(epoch_us(ts))
        |              OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, make_timestamp(MIN(us)) AS session_start,
        |       make_timestamp(MAX(us) + 1800000000) AS session_end,
        |       COUNT(*) AS n_events
        |FROM numbered GROUP BY user_id, sid""".stripMargin,
    // as-of gate and output at MICRO resolution (epoch_us/make_timestamp):
    // Spark's events table truncates parquet nanos to micros, so a raw
    // TIMESTAMP_NS compare could exclude a click in the same microsecond
    // but a later nanosecond that Spark includes (same hazard class as
    // q36/q58 — fixture rows carry sub-microsecond nanos)
    "q33_asof_last_click" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  (SELECT make_timestamp(MAX(epoch_us(c.ts))) FROM events c
        |   WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |     AND epoch_us(c.ts) <= epoch_us(e.ts)) AS last_click_ts
        |FROM events e WHERE e.event_type = 'error'""".stripMargin,
    "q34_pivot" ->
      """SELECT DATE_TRUNC('day', ts) AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1""".stripMargin)
}
