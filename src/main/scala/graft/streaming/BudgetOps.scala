package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming token-budget admission on Spark 4's transformWithState —
  * the successor API to flatMapGroupsWithState (typed per-key state
  * handles in the RocksDB state store, TTL support, timers). Exercised
  * here alongside the legacy API ([[StatefulOps]]) so the engine covers
  * both stateful surfaces.
  *
  * Semantics: each source shard has a token budget; documents are
  * admitted in (micro-batch, doc_id) order while the shard's cumulative
  * admitted tokens stay within budget, and dropped once they would
  * overflow it — the streaming-ingestion form of the batch mixing
  * recipes (mix_sources_target / sample_epochs): cap each source's
  * contribution while data arrives continuously. State is ONE long per
  * source however many documents stream through.
  */
object BudgetOps {

  final case class DocIn(source: String, doc_id: Long, n_tokens: Long)
  final case class Admitted(source: String, doc_id: Long, n_tokens: Long,
      used_after: Long)

  class BudgetProcessor(budget: Long)
      extends StatefulProcessor[String, DocIn, Admitted] {
    @transient private var used: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState[Long](
        "used", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocIn],
        timers: TimerValues): Iterator[Admitted] = {
      var u = if (used.exists()) used.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
      // deterministic order within the batch; a doc that would overflow
      // is dropped (not truncated) — later smaller docs may still fit
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        if (u + d.n_tokens <= budget) {
          u += d.n_tokens
          out += Admitted(key, d.doc_id, d.n_tokens, u)
        }
      }
      used.update(u)
      out.iterator
    }
  }

  def admitWithinBudget(
      docs: Dataset[DocIn], budget: Long): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
