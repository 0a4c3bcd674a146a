package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Alert, Event}
import org.apache.spark.sql.SparkSession

class ExtensionsStatefulSpec extends SparkSpec {

  test("GraftExtensions registers graft_dot for pure SQL") {
    // separate session wired through withExtensions (shares the local
    // SparkContext with the suite session). getOrCreate() would hand back
    // the suite's active session and silently drop the extensions, so
    // clear active/default first and restore after.
    val prev = spark // force suite session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    val v = s2.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 32.0)
    // int arrays must CAST at analysis (not silently misread packed ints)
    val vi = s2.sql(
      "SELECT graft_dot(array(1, 2, 3), array(4, 5, 6)) AS d")
      .collect()(0).getDouble(0)
    assert(vi == 32.0, s"int-array inputs must cast element-wise, got $vi")
    val vc = s2.sql(
      "SELECT graft_cosine(array(1, 2), array(2, 4)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(vc - 1.0) < 1e-12, s"got $vc")
    // non-array and wrong-arity calls must fail analysis, not codegen
    intercept[Exception] { s2.sql("SELECT graft_dot('a', 'b')").collect() }
    intercept[Exception] { s2.sql("SELECT graft_cosine(array(1.0D))").collect() }
    // the quantizer/normalizer/nearest-cell registrations
    val q8 = s2.sql("SELECT graft_quantize_int8(array(2.0D, -4.0D, 1.0D)) AS q")
      .collect()(0).getString(0)
    assert(q8 == "64,-127,32")
    val u = s2.sql("SELECT graft_unit_normalize(array(3.0D, 4.0D)) AS u")
      .collect()(0).getSeq[Double](0)
    assert(u == Seq(0.6, 0.8))
    // nearest cell: the centroid matrix must be a literal, folded into
    // the expression at resolution
    val cell = s2.sql(
      """SELECT graft_nearest_cell(array(0.9D, 0.1D),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS c""".stripMargin)
      .collect()(0).getInt(0)
    assert(cell == 0)
    intercept[Exception] {
      s2.sql("SELECT graft_nearest_cell(array(1.0D), array(array(rand())))")
        .collect()
    }
    // int-element centroid literal used to surface as a raw
    // ClassCastException from toDoubleArray(); must be a typed error
    // naming the expected type instead
    val typeErr = intercept[Exception] {
      s2.sql("SELECT graft_nearest_cell(array(1.0D, 2.0D), array(array(1, 2)))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(typeErr).exists(_.contains("array<array<double>>")),
      typeErr)
    // a NULL element inside an otherwise well-typed double matrix used to
    // NPE in toDoubleArray(); must be the same typed-error class
    val nullErr = intercept[Exception] {
      s2.sql("SELECT graft_nearest_cell(array(1.0D), " +
          "array(array(CAST(NULL AS DOUBLE))))")
        .collect()
    }
    assert(messages(nullErr).exists(_.contains("null")), nullErr)
    // and through the plan of a real table
    val n = s2.sql(
      s"SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS nn " +
        s"FROM parquet.`$sf0001/embeddings.parquet`").count()
    assert(n == 500)
  }

  test("flatMapGroupsWithState anomaly detector: O(1) state, correct alerts") {
    import spark.implicits._
    val events = Seq(
      Event(1, 1, 10.0), Event(1, 2, 11.0), Event(1, 3, 100.0), // 100 > 3*10.5
      Event(1, 4, 12.0),
      Event(2, 5, 5.0), Event(2, 6, 6.0)).toDS()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    stream.addData(events.collect().toSeq)
    val q = StatefulOps.detectAnomalies(stream.toDS(), factor = 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("alerts").start()
    try q.processAllAvailable() finally q.stop()
    val alerts = spark.table("alerts").as[Alert].collect().toSeq
    assert(alerts.map(a => (a.user_id, a.event_id)) == Seq((1L, 3L)))
    assert(math.abs(alerts.head.running_mean - 10.5) < 1e-9)
  }

  test("stateful detector carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = StatefulOps.detectAnomalies(stream.toDS(), factor = 2.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("alerts2").start()
    try {
      stream.addData(Event(7, 1, 10.0), Event(7, 2, 10.0))
      q.processAllAvailable()
      stream.addData(Event(7, 3, 50.0)) // vs mean 10 from batch 1 state
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.table("alerts2").as[Alert].collect().toSeq
    assert(alerts.map(_.event_id) == Seq(3L))
  }

  test("streaming funnel across micro-batches == batch q58 step counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import graft.streaming.StatefulOps.{StepReached, TypedEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // fixture events in timestamp order, split into three micro-batches:
    // when arrival order matches event time, the incremental machine must
    // reach exactly the steps the batch query reports
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[TypedEvent].collect().sortBy(e => (e.ts_us, e.event_type)).toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TypedEvent]
    val q = StatefulOps.funnelProgress(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      ev.grouped(math.max(1, ev.size / 3 + 1)).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("funnel_stream").as[StepReached].collect()
      .groupBy(_.step).view.mapValues(_.length.toLong).toMap
    val batchCounts = SparkEntry.queries("q58_funnel_steps")(spark, sf0001)
      .as[(Int, Long)].collect().toMap
    assert(streamed == batchCounts)
    // each user emits a step at most once
    val dup = spark.table("funnel_stream").as[StepReached].collect()
      .groupBy(r => (r.user_id, r.step)).values.exists(_.length > 1)
    assert(!dup)
  }

  test("streaming sessionizer: gap arrival closes immediately, watermark timeout flushes idle users") {
    import spark.implicits._
    import StatefulOps.{ClosedSession, SessEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // keep the timeline clear of epoch 0: the initial watermark is 0, and
    // rows at-or-before the watermark are dropped as late
    val base = 1000L
    def at(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
    val us = 60L * 1000000L // minutes -> micros
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessEvent]
    val q = StatefulOps.sessionizeStream(stream.toDS(), gapMin = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream").start()
    def emitted(): Set[(Long, Long, Long, Long)] =
      spark.table("sess_stream").as[ClosedSession].collect()
        .map(c => (c.user_id, c.start_us / us - base, c.end_us / us - base,
          c.n_events))
        .toSet
    try {
      // batch 1: user 1 two events 10 min apart (one open session),
      // user 2 one event
      stream.addData(SessEvent(1L, at(0)), SessEvent(1L, at(10)),
        SessEvent(2L, at(5)))
      q.processAllAvailable()
      assert(emitted().isEmpty, "no session may close before any gap")
      // batch 2: user 1 returns 50 min later -> previous session closes
      // on arrival
      stream.addData(SessEvent(1L, at(60)))
      q.processAllAvailable()
      assert(emitted() == Set((1L, 0L, 10L, 2L)))
      // batch 3+4: event time advances to 180 min; the watermark (150)
      // passes both idle users' last+gap, so the TIMEOUT path flushes
      // them (timeouts fire the batch after the watermark moves)
      stream.addData(SessEvent(3L, at(180)))
      q.processAllAvailable()
      stream.addData(SessEvent(3L, at(181)))
      q.processAllAvailable()
      assert(emitted() == Set(
        (1L, 0L, 10L, 2L), (1L, 60L, 60L, 1L), (2L, 5L, 5L, 1L)))
    } finally q.stop()
  }

  test("streaming sessionizer == batch q60 on fixture events fed in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import StatefulOps.{ClosedSession, SessEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect()
      .sortBy(_._2.getTime).map { case (u, t) => SessEvent(u, t) }.toSeq
    val maxMs = ev.map(_.ts.getTime).max
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessEvent]
    val q = StatefulOps.sessionizeStream(stream.toDS(), gapMin = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_parity").start()
    try {
      ev.grouped(math.max(1, ev.size / 4 + 1)).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
      // sentinel far past every session's last+gap: advances the
      // watermark so every open session flushes on the following batch
      stream.addData(SessEvent(-1L,
        new java.sql.Timestamp(maxMs + 10L * 86400000L)))
      q.processAllAvailable()
      stream.addData(SessEvent(-1L,
        new java.sql.Timestamp(maxMs + 10L * 86400000L + 1)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_parity").as[ClosedSession].collect()
      .filter(_.user_id >= 0)
      .map(c => (c.user_id, c.start_us, c.end_us, c.n_events)).toSet
    // exact-micros comparison: the streaming side reconstructs full
    // microsecond precision from getTime+getNanos, matching batch
    // unix_micros with no truncation on either side
    val batch = SparkEntry.queries("q60_sessionize")(spark, sf0001)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${streamed.diff(batch).take(3)} " +
        s"onlyBatch=${batch.diff(streamed).take(3)}")
  }

  test("streaming SCD2 islands == batch q68 on fixture events fed in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import StatefulOps.{ClosedIsland, IslandEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
      // feed in the batch query's (us, event_id) order so cross-batch
      // ties agree with q68's window tiebreak
      .sortBy { case (_, id, t, _) => (t.getTime, id) }
      .map { case (u, id, t, tp) => IslandEvent(u, id, t, tp) }.toSeq
    val maxMs = ev.map(_.ts.getTime).max
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[IslandEvent]
    val q = StatefulOps.islandsStream(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("isl_parity").start()
    try {
      ev.grouped(math.max(1, ev.size / 4 + 1)).foreach { batch =>
        stream.addData(batch)
        q.processAllAvailable()
      }
      // far-future sentinels: first advances the watermark past every
      // open island's flush horizon, second gives the store a batch in
      // which to fire the timeouts
      stream.addData(IslandEvent(-1L, -1L,
        new java.sql.Timestamp(maxMs + 10L * 86400000L), "view"))
      q.processAllAvailable()
      stream.addData(IslandEvent(-1L, -2L,
        new java.sql.Timestamp(maxMs + 10L * 86400000L + 1), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("isl_parity").as[ClosedIsland].collect()
      .filter(_.user_id >= 0)
      .map(c => (c.user_id, c.island, c.event_type,
        c.valid_from_us, c.valid_to_us, c.n_events)).toSet
    val batch = SparkEntry.queries("q68_value_islands")(spark, sf0001)
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"onlyStream=${streamed.diff(batch).take(3)} " +
        s"onlyBatch=${batch.diff(streamed).take(3)}")
  }

  test("streaming SCD2 islands: cross-batch out-of-order same-type event widens, never shrinks, the open run") {
    import spark.implicits._
    import StatefulOps.{ClosedIsland, IslandEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // keep the timeline clear of epoch 0 (initial watermark) and use a
    // watermark delay large enough that a batch-2 event with a batch-1-era
    // timestamp is still on time
    val base = 10000L
    def at(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
    val us = 60L * 1000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[IslandEvent]
    val q = StatefulOps.islandsStream(stream.toDS(), lateMin = 120)
      .writeStream.outputMode("append").format("memory")
      .queryName("isl_ooo").start()
    try {
      // batch 1: open a "view" run covering [10, 20]
      stream.addData(IslandEvent(1L, 1L, at(10), "view"),
        IslandEvent(1L, 2L, at(20), "view"))
      q.processAllAvailable()
      // batch 2: a same-type straggler at minute 5 — earlier than the
      // run's from_us, legal under the 120-min watermark. Pre-fix this
      // overwrote to_us=5 (< from_us=10); it must instead widen to [5, 20]
      stream.addData(IslandEvent(1L, 3L, at(5), "view"))
      q.processAllAvailable()
      // batch 3: a different type closes the run and emits it
      stream.addData(IslandEvent(1L, 4L, at(30), "click"))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("isl_ooo").as[ClosedIsland].collect()
      .map(c => (c.user_id, c.island, c.event_type,
        c.valid_from_us / us - base, c.valid_to_us / us - base, c.n_events))
      .toSet
    assert(closed == Set((1L, 1L, "view", 5L, 20L, 3L)),
      s"got $closed")
    val inverted = spark.table("isl_ooo").as[ClosedIsland].collect()
      .filter(c => c.valid_to_us < c.valid_from_us)
    assert(inverted.isEmpty, s"inverted intervals: ${inverted.toSeq}")
  }

  test("streaming sessionizer: cross-batch in-watermark straggler widens, never shrinks, the open session") {
    import spark.implicits._
    import StatefulOps.{ClosedSession, SessEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 10000L
    def at(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
    val us = 60L * 1000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessEvent]
    val q = StatefulOps.sessionizeStream(stream.toDS(), gapMin = 120)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_ooo").start()
    try {
      // batch 1: open a session covering [10, 20]
      stream.addData(SessEvent(1L, at(10)), SessEvent(1L, at(20)))
      q.processAllAvailable()
      // batch 2: a straggler at minute 5 — earlier than the session's
      // start, legal under the 120-min watermark. Pre-fix the plain
      // `last_us = us` overwrite shrank the open end to 5 (< start 10),
      // so the closer below would emit end_us < start_us AND mis-split
      // against the shrunken last_us
      stream.addData(SessEvent(1L, at(5)))
      q.processAllAvailable()
      // batch 3: past the gap (150 - 20 = 130 > 120) — closes [5, 20]
      stream.addData(SessEvent(1L, at(150)))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("sess_ooo").as[ClosedSession].collect()
      .map(c => (c.user_id, c.start_us / us - base, c.end_us / us - base,
        c.n_events)).toSet
    assert(closed == Set((1L, 5L, 20L, 3L)), s"got $closed")
  }

  test("streaming SCD2 islands: post-flush events continue the per-user island numbering") {
    import spark.implicits._
    import StatefulOps.{ClosedIsland, IslandEvent}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the SCD2 table this feeds is keyed on (user_id, island): a user
    // whose open run was flushed by the inactivity timeout and who then
    // comes BACK must continue numbering, not restart at 1 — pre-fix the
    // state was removed at flush and the next run re-emitted island 1
    val base = 10000L
    def at(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
    val us = 60L * 1000000L
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[IslandEvent]
    val q = StatefulOps.islandsStream(stream.toDS(), lateMin = 60,
        flushHorizonMin = 60)
      .writeStream.outputMode("append").format("memory")
      .queryName("isl_flush").start()
    try {
      // batch 1: open a "view" run [10, 20] for user 1
      stream.addData(IslandEvent(1L, 1L, at(10), "view"),
        IslandEvent(1L, 2L, at(20), "view"))
      q.processAllAvailable()
      // advance the watermark past to_us + flush horizon (wm = 145-60 =
      // 85 > 20+60), then give the store a batch to fire the timeout
      stream.addData(IslandEvent(-1L, -1L, at(145), "view"))
      q.processAllAvailable()
      stream.addData(IslandEvent(-1L, -2L, at(146), "view"))
      q.processAllAvailable()
      // user 1 returns after the flush; a different type then closes the
      // new run so it emits
      stream.addData(IslandEvent(1L, 3L, at(150), "click"))
      q.processAllAvailable()
      stream.addData(IslandEvent(1L, 4L, at(160), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("isl_flush").as[ClosedIsland].collect()
    // the flush sentinel itself must never surface as an island, and no
    // later batch may re-fire it (EventTimeTimeout with no registration)
    assert(!rows.exists(_.n_events == 0L),
      s"sentinel leaked as an island: ${rows.toSeq}")
    val user1 = rows.filter(_.user_id == 1L)
      .map(c => (c.island, c.event_type,
        c.valid_from_us / us - base, c.valid_to_us / us - base,
        c.n_events)).toSet
    assert(user1 == Set(
      (1L, "view", 10L, 20L, 2L),   // flushed by the timeout
      (2L, "click", 150L, 150L, 1L) // post-flush run: index CONTINUES
    ), s"got $user1")
  }

  test("transformWithState budget admission: per-source caps hold across micro-batches") {
    import spark.implicits._
    import graft.streaming.BudgetOps
    import graft.streaming.BudgetOps.{Admitted, DocIn}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocIn]
    val q = BudgetOps.admitWithinBudget(stream.toDS(), budget = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("budget_stream").start()
    try {
      // batch 1: src0 uses 90 of 100; src1 uses 60
      stream.addData(DocIn("src0", 1L, 50L), DocIn("src0", 2L, 40L),
        DocIn("src1", 3L, 60L))
      q.processAllAvailable()
      // batch 2: src0 has 10 left -> 30-token doc dropped, 10-token doc
      // (higher id, same batch) still admitted; src1 fits exactly
      stream.addData(DocIn("src0", 4L, 30L), DocIn("src0", 5L, 10L),
        DocIn("src1", 6L, 40L))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.table("budget_stream").as[Admitted].collect()
      .map(a => a.doc_id -> a.used_after).toMap
    assert(got == Map(1L -> 50L, 2L -> 90L, 3L -> 60L, 5L -> 100L, 6L -> 100L))
  }

  test("optimizer rule rewrites HOF dot idiom to native graft_dot") {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false").getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    val e = s2.read.parquet(s"$sf0001/embeddings.parquet")
    val hof = e.select(graft.functions.VectorFunctions
      .dotHof(org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
    val plan = hof.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan.take(500))
    assert(!plan.contains("aggregate("), plan.take(500))
    // and the rewritten plan computes the same values as the native form
    val native = e.select(graft.functions.VectorFunctions
      .dot(org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ==
      native.collect().map(_.getDouble(0)).toSeq)

    // near-miss shapes must NOT rewrite: the rule is session-wide, so a
    // loose pattern would silently change user results
    import org.apache.spark.sql.functions._
    val nearMisses = Seq(
      // (x, y) -> x * x: not a product of both lambda args
      e.select(aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"), (x, _) => x * x),
        lit(0.0), (acc, v) => acc + v).as("d")),
      // (acc, v) -> v + v: accumulator unused
      e.select(aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"), (x, y) => x * y),
        lit(0.0), (_, v) => v + v).as("d")),
      // non-identity finish lambda
      e.select(aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v, s => s + lit(1.0)).as("d")))
    nearMisses.foreach { df =>
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("graft_dot"), p.take(300))
    }
  }

  test("optimizer rule rewrites levenshtein filters to the banded threshold form") {
    import org.apache.spark.sql.functions._
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        // keep the Filter visible in the optimized plan (otherwise the
        // local Seq relation is pre-evaluated and there is no plan to
        // assert on); execution semantics are unchanged
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .config("spark.ui.enabled", "false").getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    import s2.implicits._
    val df = Seq(
      ("kitten", "sitting"),   // dist 3
      ("abc", "abc"),          // dist 0
      ("abc", "xyz"),          // dist 3
      ("short", "muchlongerstring"), // dist > 3
      (null.asInstanceOf[String], "x")) // null -> filtered either way
      .toDF("a", "b")
    def optimized(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.optimizedPlan.toString
    val le = df.filter(levenshtein($"a", $"b") <= 3)
    assert(optimized(le).contains("levenshtein(") &&
      optimized(le).contains("Some(3)) >= 0"), optimized(le).take(400))
    assert(le.select($"a").as[String].collect().toSet ==
      Set("kitten", "abc"))
    val lt = df.filter(levenshtein($"a", $"b") < 3)
    assert(optimized(lt).contains("Some(2)) >= 0"), optimized(lt).take(400))
    assert(lt.select($"a", $"b").as[(String, String)].collect().toSeq ==
      Seq(("abc", "abc")))
    // PROJECTED levenshtein is untouched (caller wants the distance)
    val proj = df.select(levenshtein($"a", $"b").as("d"))
    assert(!optimized(proj).contains(">= 0"), optimized(proj).take(400))
    // and the rewrite agrees with the unbounded form on the suite
    // session (no extensions) over the fixture prefixes
    def pairs(s: SparkSession): Set[(Long, Long)] = {
      val p = s.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), lower(substring(col("text"), 1, 40)).as("pre"))
      p.toDF("da", "pa").join(p.toDF("db", "pb"), col("da") < col("db"))
        .filter(levenshtein(col("pa"), col("pb")) <= 3)
        .select(col("da"), col("db"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pairs(s2) == pairs(spark))
    assert(pairs(s2).nonEmpty)
  }

  test("optimizer rule rewrites levenshtein JOIN conditions to the banded form") {
    import org.apache.spark.sql.functions._
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .config("spark.ui.enabled", "false").getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    import s2.implicits._
    val left = Seq("kitten", "abc", "zzzzzzzzzz").toDF("a")
    val right = Seq("sitting", "abd", "qqq").toDF("b")
    // an edit-distance similarity JOIN spelled with the unbounded form:
    // the rule must rewrite the join condition (evaluated per candidate
    // pair — exactly where the banded O(k·n) DP pays most)
    val j = left.join(right, levenshtein($"a", $"b") <= 3)
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("Some(3)) >= 0"), plan.take(400))
    assert(j.as[(String, String)].collect().toSet == Set(
      ("kitten", "sitting"), // dist 3
      ("abc", "abd"),        // dist 1
      ("abc", "qqq")))       // dist 3
    // outer joins are safe too (the two spellings agree as three-valued
    // predicates, so non-matching rows null-pad identically)
    val lo = left.join(right, levenshtein($"a", $"b") <= 3, "left")
    assert(lo.queryExecution.optimizedPlan.toString.contains("Some(3)) >= 0"))
    assert(lo.filter($"b".isNull).as[(String, String)].collect()
      .map(_._1).toSet == Set("zzzzzzzzzz"))
    // a join whose condition merely REFERENCES a projected distance is
    // untouched (the caller wants the unbounded value downstream)
    val proj = left.crossJoin(right)
      .select($"a", $"b", levenshtein($"a", $"b").as("d"))
    assert(!proj.queryExecution.optimizedPlan.toString.contains(">= 0"))
  }

  test("optimizer rule turns array_contains joins into explode + equi joins") {
    import org.apache.spark.sql.functions._
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .config("spark.ui.enabled", "false").getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    import s2.implicits._
    val tagged = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("b", "b", "c")), // duplicate element: must match ONCE
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]])) // null array: never matches
      .toDF("id", "tags")
    val kw = Seq("b", "c", "zz").toDF("kw")
    def physical(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString

    // INNER, array on the left: hash join, exact multiplicity
    val inner = tagged.join(kw, array_contains($"tags", $"kw"))
    assert(!physical(inner).contains("NestedLoop"), physical(inner).take(600))
    assert(physical(inner).contains("Generate"), physical(inner).take(600))
    assert(inner.select($"id", $"kw").as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "b"), (2L, "b"), (2L, "c")))

    // INNER, array on the right (sides swapped): same result
    val innerR = kw.join(tagged, array_contains($"tags", $"kw"))
    assert(!physical(innerR).contains("NestedLoop"))
    assert(innerR.select($"id", $"kw").as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "b"), (2L, "b"), (2L, "c")))

    // LEFT SEMI, array on the left: one row per qualifying left row,
    // duplicates of identical left rows preserved (the tag dedup)
    val dupLeft = tagged.unionAll(Seq((2L, Seq("b", "b", "c")))
      .toDF("id", "tags"))
    val semi = dupLeft.join(kw, array_contains($"tags", $"kw"), "left_semi")
    assert(!physical(semi).contains("NestedLoop"), physical(semi).take(600))
    assert(semi.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 2L))

    // LEFT SEMI / ANTI, array on the right: explode-only path
    val keys = Seq("b", "zz").toDF("k")
    val semiR = keys.join(tagged, array_contains($"tags", $"k"), "left_semi")
    assert(!physical(semiR).contains("NestedLoop"))
    assert(semiR.as[String].collect().toSeq == Seq("b"))
    val antiR = keys.join(tagged, array_contains($"tags", $"k"), "left_anti")
    assert(!physical(antiR).contains("NestedLoop"))
    assert(antiR.as[String].collect().toSeq == Seq("zz"))

    // guards: float arrays keep the nested-loop plan (NaN semantics),
    // and ANTI with the array on the left is not expressible -> untouched
    val fl = Seq((1L, Seq(1.0, 2.0))).toDF("id", "arr")
    val fk = Seq(2.0).toDF("k")
    assert(physical(fl.join(fk, array_contains($"arr", $"k")))
      .contains("NestedLoop"))
    assert(physical(tagged.join(kw, array_contains($"tags", $"kw"),
      "left_anti")).contains("NestedLoop"))

    // residual conjuncts survive: membership AND an inequality
    val res = tagged.join(kw,
      array_contains($"tags", $"kw") && $"id" =!= 2L)
    assert(!physical(res).contains("NestedLoop"))
    assert(res.select($"id", $"kw").as[(Long, String)].collect().toSeq ==
      Seq((1L, "b")))

    // the declarative spelling equals the no-extensions session's result
    // on fixture-shaped data (order baskets vs a brand watchlist)
    def exposure(s: SparkSession): Set[(String, Long)] = {
      val li = s.read.parquet(s"$sf0001/lineitem.parquet")
      val pt = s.read.parquet(s"$sf0001/part.parquet")
      val baskets = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("p_brand")).as("tags"))
      val watch = pt.filter(col("p_size") === 50)
        .select(col("p_brand").as("brand")).distinct()
      baskets.join(watch, array_contains(col("tags"), col("brand")))
        .groupBy(col("brand")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(exposure(s2) == exposure(spark))
    assert(exposure(s2).nonEmpty)
  }

  test("semi-left membership rewrite: tag-only collapse keeps float/map columns verbatim") {
    import org.apache.spark.sql.functions._
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .config("spark.ui.enabled", "false").getOrCreate()
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    import s2.implicits._
    val left = Seq(
      (1L, Seq("a", "b"), -0.0, Map("w" -> 1.0)),
      (2L, Seq("b", "c"), Double.NaN, Map("w" -> 2.0)),
      (3L, Seq("zz"), 3.5, Map("w" -> 3.0)))
      .toDF("id", "tags", "score", "meta")
    val kw = Seq("b").toDF("kw")
    val semi = left.join(kw, array_contains($"tags", $"kw"), "left_semi")
    val phys = semi.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop"), phys.take(600))
    // the collapse groups on the 8-byte tag ALONE; left columns ride
    // first() buffers. A full-row grouping would both reject the map
    // column (maps are un-groupable) and -0.0/NaN-NORMALIZE the double
    // — a session-wide rule silently altering semi-join output values.
    val opt = semi.queryExecution.optimizedPlan.toString
    val aggLine = opt.linesIterator.find(_.trim.startsWith("Aggregate"))
      .getOrElse(fail(s"no Aggregate in plan: ${opt.take(600)}"))
    val grouping =
      aggLine.substring(aggLine.indexOf("[") + 1, aggLine.indexOf("]"))
    assert(grouping.contains("__ac_tag") && !grouping.contains(","),
      s"grouping keys must be the tag alone: $aggLine")
    val rows = semi.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(java.lang.Double.doubleToRawLongBits(rows(0).getDouble(2)) ==
      java.lang.Double.doubleToRawLongBits(-0.0),
      s"-0.0 must survive the collapse verbatim, got ${rows(0).getDouble(2)}")
    assert(rows(1).getDouble(2).isNaN)
    assert(rows.map(_.getMap[String, Double](3)("w")).toSeq ==
      Seq(1.0, 2.0))
  }
}
