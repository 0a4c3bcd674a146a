package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters of the classic
  * API — the supported low-level seam for third-party native expressions
  * (graft.functions.DotProduct et al.). Kept to two one-liners so the
  * private-API surface we touch is minimal and auditable.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (classic API). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzedPlan(df: Dataset[_]):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Re-stamp a checkpointed DataFrame's `LogicalRDD` with the hash
    * partitioning its rows PHYSICALLY have. `Dataset.localCheckpoint`
    * tries to carry the child plan's partitioning into the LogicalRDD,
    * but under AQE the adaptive root frequently reports
    * `UnknownPartitioning` (coalesced / not-yet-rewritable shuffle
    * reads), so every consumer of the materialized index pays a fresh
    * exchange for a partitioning the data already satisfies — measured
    * round 16: each `repartition(k).buildCheckpoint()` site re-shuffled
    * per consumer. Caller contract: the checkpoint was built from a
    * `repartition(numParts, keys…)` (REPARTITION_BY_NUM — AQE may not
    * coalesce it), so `HashPartitioning(keys, numParts)` is the true
    * physical layout. Guarded: if the plan is not a bare LogicalRDD, a
    * key is missing, or the RDD's partition count differs from
    * `numParts`, the frame is returned unstamped (correct, just
    * unoptimized). Attribute dedup on self-joins is safe:
    * `LogicalRDD.newInstance` rewrites the stamped partitioning's
    * attributes along with the output. */
  def stampHashPartitioning(
      ck: DataFrame, numParts: Int, keyNames: String*): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.catalyst.expressions.{Attribute, ExpressionSet}
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.getNumPartitions == numParts =>
        val keys: Seq[Option[Attribute]] =
          keyNames.map(n => lr.output.find(_.name == n))
        if (keys.exists(_.isEmpty)) ck
        else {
          // carry the checkpoint's stats forward (computeStats resolves
          // the originStats localCheckpoint captured) so join-strategy
          // estimates are unchanged by the re-stamp
          ofRows(ck.sparkSession, LogicalRDD(
            lr.output, lr.rdd,
            HashPartitioning(keys.map(_.get), numParts),
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            ck.sparkSession.asInstanceOf[classic.SparkSession],
            Some(lr.computeStats()),
            None: Option[ExpressionSet]))
        }
      case _ => ck
    }
  }
}
