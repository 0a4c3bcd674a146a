package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization seam for index/build pipelines.
  *
  * Queries wrap every `localCheckpoint()` in [[Checkpoint.apply]] so the
  * wide-shuffle audit can switch materialization OFF and walk the FULL
  * lineage: an eager localCheckpoint plans as a bare RDD scan, so any
  * exchange below it — the one-time index builds — escaped
  * `QueryDebug.wideShuffles` and carried its justification as an in-code
  * comment the audit could not check (the round-5 blind spot, SCALE.md).
  * With `inlineForAudit` set, the checkpoint is skipped, the build
  * exchanges surface in the walked plan, and the audit's allowlist
  * becomes the single machine-checked justification record.
  *
  * Production behavior is unchanged (`inlineForAudit` defaults to false
  * and only `QueryDebug audit` / AuditSpec flip it): checkpoints still
  * cut lineage and fix consumer partitioning exactly as before. Inline
  * mode re-expands each checkpoint reference, so audit-mode plans are a
  * SUPERSET of production exchanges — fine for an invariant that must
  * hold for every exchange.
  */
object Checkpoint {
  @volatile var inlineForAudit: Boolean = false

  def apply(df: DataFrame): DataFrame =
    if (inlineForAudit) df else df.localCheckpoint()

  /** Postfix form so call sites keep the `.localCheckpoint()` shape. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def buildCheckpoint(): DataFrame = Checkpoint(df)
  }
}
