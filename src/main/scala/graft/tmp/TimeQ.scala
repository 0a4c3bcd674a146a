package graft.tmp

import org.apache.spark.sql.SparkSession

/** Throwaway per-query timer: TimeQ <sfDir> <query>[,query...] [reps] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"rep$r $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
