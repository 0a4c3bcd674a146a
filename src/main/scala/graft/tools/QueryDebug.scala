package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: inspect or time registered queries by name.
  *
  *   QueryDebug explain <query>[,query...] [sfDir]   — physical plan dump
  *   QueryDebug time <sfDir> <query>[,query...] [reps] — wall-clock timing
  *
  * (Replaces the former throwaway graft.tmp.{Expl,TimeQ} mains.)
  */
object QueryDebug {
  def main(args: Array[String]): Unit = args(0) match {
    case "explain" => explain(args.drop(1))
    case "time"    => time(args.drop(1))
    case other => sys.error(s"unknown mode '$other' (expected explain|time)")
  }

  private def explain(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    for (n <- args(0).split(",")) {
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }

  private def time(args: Array[String]): Unit = {
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
