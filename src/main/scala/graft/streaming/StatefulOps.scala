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
