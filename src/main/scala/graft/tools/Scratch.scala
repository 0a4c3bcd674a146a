package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Checkpoint.CheckpointOps

/** Throwaway experiment harness (not registered anywhere). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(20000).select(col("id"), (col("id") % 97).as("k"))

    def exch(d: org.apache.spark.sql.DataFrame): Int = {
      d.write.format("noop").mode("overwrite").save() // execute once
      d.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
    }

    val plain = df.repartition(col("k")).buildCheckpoint()
    val stamped = df.buildCheckpointBy("k")
    println("stamped analyzed: " + stamped.queryExecution.optimizedPlan
      .collectLeaves().head.toString.take(120))

    val jPlain = plain.as("a").join(plain.as("b"), "k")
    val jStamp = stamped.as("a").join(stamped.as("b"), "k")
    println(s"join rows plain=${jPlain.count()} stamped=${jStamp.count()}")
    println(s"join exchanges plain=${exch(jPlain)} stamped=${exch(jStamp)}")

    val gPlain = plain.groupBy("k").count()
    val gStamp = stamped.groupBy("k").count()
    println(s"agg rows plain=${gPlain.count()} stamped=${gStamp.count()}")
    println(s"agg exchanges plain=${exch(gPlain)} stamped=${exch(gStamp)}")

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("id")
    val wPlain = plain.withColumn("rn", row_number().over(w))
    val wStamp = stamped.withColumn("rn", row_number().over(w))
    println(s"win rows plain=${wPlain.count()} stamped=${wStamp.count()}")
    println(s"win exchanges plain=${exch(wPlain)} stamped=${exch(wStamp)}")

    // content equality of the join output
    val a = jPlain.selectExpr("k", "a.id", "b.id").orderBy("k", "a.id", "b.id")
    val b = jStamp.selectExpr("k", "a.id", "b.id").orderBy("k", "a.id", "b.id")
    println("join content equal: " +
      (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty))
    spark.stop()
  }
}
