package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator via flatMapGroupsWithState — the
  * arbitrary-state surface (beyond what windowed aggregation expresses).
  *
  * `AnomalyDetector`: per user, tracks a running mean of `value` and emits
  * an alert row whenever an event's value exceeds `factor ×` the running
  * mean seen so far (classic online anomaly flagging). State is O(1) per
  * key — (count, sum) — so at 100 TB the state store scales with keys,
  * not events.
  */
object StatefulOps {

  final case class Event(user_id: Long, event_id: Long, value: Double)
  final case class MeanState(n: Long, sum: Double)
  final case class Alert(user_id: Long, event_id: Long, value: Double,
      running_mean: Double)

  /** Incremental ordered-funnel state for [[funnelProgress]]: the first
    * completion time (epoch micros) of each reached step, or -1. O(1) per
    * user like MeanState. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class TypedEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class StepReached(user_id: Long, step: Int, ts_us: Long)

  /** Streaming twin of the batch q58_funnel_steps: per user, advance a
    * view → click → purchase machine on each micro-batch and emit a row
    * the moment a step is first completed (strictly after the previous
    * step's first completion, same gate as the batch oracle). State is
    * three longs per user — keys × 24 bytes at any event volume; no
    * event is retained after its batch.
    *
    * Precondition for batch parity: per-user events must arrive in
    * event-time order ACROSS micro-batches (within a batch they are
    * sorted here). A view arriving after a later view was already
    * accepted is ignored rather than retroactively lowering t1 — the
    * machine is incremental and keeps no event buffer; out-of-order
    * sources need a watermark-delayed sort upstream. */
  def funnelProgress(events: Dataset[TypedEvent]): Dataset[StepReached] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReached](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TypedEvent],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[StepReached]
          // deterministic order within the batch
          it.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            e.event_type match {
              case "view" if st.t1 < 0 =>
                st = st.copy(t1 = e.ts_us)
                out += StepReached(user, 1, e.ts_us)
              case "click" if st.t1 >= 0 && st.t2 < 0 && e.ts_us > st.t1 =>
                st = st.copy(t2 = e.ts_us)
                out += StepReached(user, 2, e.ts_us)
              case "purchase" if st.t2 >= 0 && st.t3 < 0 && e.ts_us > st.t2 =>
                st = st.copy(t3 = e.ts_us)
                out += StepReached(user, 3, e.ts_us)
              case _ =>
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long,
      end_us: Long, n_events: Long)

  /** Streaming twin of the batch q60_sessionize: per-user gap-rule
    * sessions, closed EITHER by a same-user event arriving past the gap
    * (emitted immediately) OR by event-time TIMEOUT once the watermark
    * passes last_event + gap — the state-store surface q32's built-in
    * session_window cannot express when the per-session output needs
    * custom state (here: exact first/last micros + count with O(1)
    * state per user, no event retention).
    *
    * The timeout is registered against the watermark clock
    * (EventTimeTimeout), so idle users' sessions flush deterministically
    * as event time advances — no wall-clock flakiness, and at scale the
    * state store holds exactly one 24-byte row per ACTIVE user. */
  def sessionizeStream(
      events: Dataset[SessEvent], gapMin: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMin * 60L * 1000000L
    val gapMs = gapMin * 60L * 1000L
    events
      .withWatermark("ts", s"$gapMin minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent],
         state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          if (state.hasTimedOut) {
            val st = state.get
            out += ClosedSession(user, st.start_us, st.last_us, st.n)
            state.remove()
          } else {
            var st = state.getOption.orNull
            // deterministic order within the batch; exact micros from
            // epoch: getTime truncates to millis, so the sub-millisecond
            // part must come from getNanos (floorDiv for pre-epoch safety)
            it.map(e => Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L).toSeq.sorted.foreach { us =>
              if (st == null) st = SessionState(us, us, 1L)
              else if (us - st.last_us > gapUs) {
                out += ClosedSession(user, st.start_us, st.last_us, st.n)
                st = SessionState(us, us, 1L)
              } else st = SessionState(
                // min/max, not overwrite (the islandsStream rule): a
                // late-but-within-watermark event from an EARLIER
                // micro-batch era must widen the open session, never
                // move last_us backwards — plain `last_us = us` could
                // emit end_us < start_us and then mis-split the next
                // on-time event against the shrunken last_us
                math.min(st.start_us, us), math.max(st.last_us, us),
                st.n + 1)
            }
            if (st != null) {
              state.update(st)
              // must stay ahead of the watermark or registration throws;
              // a late-straggling group re-arms one ms past it
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(st.last_us, 1000L) + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }

  final case class IslandEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, event_type: String)
  final case class IslandState(idx: Long, etype: String,
      from_us: Long, to_us: Long, n: Long)
  final case class ClosedIsland(user_id: Long, island: Long,
      event_type: String, valid_from_us: Long, valid_to_us: Long,
      n_events: Long)

  /** Streaming twin of the batch q68_value_islands: per-user SCD2 run
    * compression on a live change stream — consecutive same-type runs
    * close the moment a DIFFERENT type arrives for that user (emitted
    * immediately with their validity interval and per-user island
    * index), and the final open run flushes by event-time TIMEOUT once
    * the watermark passes last_event + flush horizon (the sessionizer's
    * EventTimeTimeout recipe — deterministic, no wall clock). This is
    * the streaming CDC→SCD2 path a warehouse runs between batch
    * rebuilds. State is O(1) per user: (island idx, current type,
    * interval, count) — the store scales with users, not events (active
    * users hold an open run; flushed users a ~48-byte index sentinel
    * that keeps per-user island numbering unique across the flush).
    * In-batch arrival order is canonicalized to (us, event_id), the
    * batch query's exact tiebreak. */
  def islandsStream(
      events: Dataset[IslandEvent], lateMin: Int = 30,
      flushHorizonMin: Int = 5 * 1440): Dataset[ClosedIsland] = {
    import events.sparkSession.implicits._
    // Two independent clocks: `lateMin` is the WATERMARK delay (late-data
    // tolerance); `flushHorizonMin` is how long an open island survives
    // user INACTIVITY before being emitted as final. Strict SCD2 never
    // times out (the open version IS the current row) — the horizon
    // exists so bounded replays flush; it must exceed the max same-user
    // inter-event gap or a quiet stretch splits one batch island in two
    // (observed at 30 min on the fixture: 812 streamed vs 802 batch).
    val flushMs = flushHorizonMin * 60L * 1000L
    events
      .withWatermark("ts", s"$lateMin minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IslandState, ClosedIsland](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[IslandEvent],
         state: GroupState[IslandState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedIsland]
          if (state.hasTimedOut) {
            val st = state.get
            out += ClosedIsland(user, st.idx, st.etype,
              st.from_us, st.to_us, st.n)
            // keep a COUNTER SENTINEL (n = 0, next index pre-advanced)
            // instead of removing: a post-flush event would otherwise
            // restart the per-user index at 1 and emit a duplicate
            // (user_id, island) key — fatal for the SCD2 table keyed on
            // it. No timeout is re-registered (EventTimeTimeout never
            // fires without one), so the residual state is ~48 bytes
            // per ever-flushed user — the same O(users) footprint as
            // the SCD2 dimension this operator feeds; strict SCD2
            // deployments (horizon = ∞) never create sentinels at all.
            state.update(IslandState(st.idx + 1, "", 0L, 0L, 0L))
          } else {
            var st = state.getOption.orNull
            it.map(e => (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L, e.event_id, e.event_type))
              .toSeq.sorted.foreach { case (us, _, t) =>
                if (st == null) st = IslandState(1L, t, us, us, 1L)
                else if (st.n == 0L)
                  // sentinel: no open run; idx already points at the
                  // next unused island index for this user
                  st = IslandState(st.idx, t, us, us, 1L)
                else if (t != st.etype) {
                  out += ClosedIsland(user, st.idx, st.etype,
                    st.from_us, st.to_us, st.n)
                  st = IslandState(st.idx + 1, t, us, us, 1L)
                } else st = IslandState(st.idx, st.etype,
                  // min/max, not overwrite: a same-type event landing in a
                  // LATER micro-batch with an EARLIER timestamp (legal within
                  // the watermark) must widen the open run, never shrink it —
                  // plain `to_us = us` could emit valid_to_us < valid_from_us.
                  // A late DIFFERENT-type event still splits the run at its
                  // arrival point (the machine keeps no event buffer to
                  // re-interleave); that residual divergence from batch q68
                  // is part of the documented flush-horizon caveat above.
                  math.min(st.from_us, us), math.max(st.to_us, us), st.n + 1)
              }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(st.to_us, 1000L) + flushMs,
                state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }

  def detectAnomalies(
      events: Dataset[Event],
      factor: Double = 3.0): Dataset[Alert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MeanState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[MeanState]) =>
          var st = state.getOption.getOrElse(MeanState(0L, 0.0))
          val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
          // deterministic order within the batch
          it.toSeq.sortBy(_.event_id).foreach { e =>
            if (st.n > 0) {
              val mean = st.sum / st.n
              if (e.value > factor * mean)
                alerts += Alert(user, e.event_id, e.value, mean)
            }
            st = MeanState(st.n + 1, st.sum + e.value)
          }
          state.update(st)
          alerts.iterator
      }
  }
}
