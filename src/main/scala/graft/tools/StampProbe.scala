package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (r17): measured checkpoint bytes + adaptive-stamp
  * engagement at a given sfDir. Usage: StampProbe <sfDir> [minBytes] */
object StampProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1)
      spark.conf.set("spark.graft.stamp.minBytes", args(1))
    println("conf minBytes = " + spark.conf.get(
      "spark.graft.stamp.minBytes", "unset(default 256MB)"))
    val sh = graft.queries.DedupQueries.shingleIndex(spark, sfDir)
      .repartition(col("doc_id"))
    val ck = sh.localCheckpoint()
    val lr = ck.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    val info = spark.sparkContext.getRDDStorageInfo.find(_.id == lr.rdd.id)
    println(s"rdd=${lr.rdd.id} storageInfo=$info " +
      s"bytes=${info.map(i => i.memSize + i.diskSize)}")
    println("all storage: " + spark.sparkContext.getRDDStorageInfo.map(i =>
      s"${i.id}:${i.memSize + i.diskSize}").mkString(", "))
    import graft.operators.Checkpoint.CheckpointOps
    val ad = graft.queries.DedupQueries.shingleIndex(spark, sfDir)
      .repartition(col("doc_id")).buildCheckpointAdaptiveBy("doc_id")
    println("adaptive partitioning: " + ad.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      .outputPartitioning)
    spark.stop()
  }
}
