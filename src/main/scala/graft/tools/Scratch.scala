package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment harness (not registered anywhere). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def report(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val lr = d.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      println(s"$tag: partitioning=${lr.outputPartitioning} " +
        s"nParts=${lr.rdd.getNumPartitions}")
    }

    // 1. range source (the earlier experiment that preserved)
    val r = spark.range(20000).select(col("id"), (col("id") % 97).as("k"))
    report("range+repart(k)", r.repartition(col("k")).localCheckpoint())

    // 2. parquet + explode (the shingle-index shape)
    val sh = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("s"))
    report("parquet+explode+repart(doc_id)",
      sh.repartition(col("doc_id")).localCheckpoint())

    // 3. groupBy output
    val g = r.groupBy("k").count()
    report("groupBy ckpt", g.localCheckpoint())

    // 4. parquet + explode + repartition with pinned n
    report("parquet+repart(8,doc_id)",
      sh.repartition(8, col("doc_id")).localCheckpoint())
    spark.stop()
  }
}
