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
    case "audit"   => audit(args.drop(1))
    case other =>
      sys.error(s"unknown mode '$other' (expected explain|time|audit)")
  }

  /** Raw-width shuffle audit: for EVERY registered query, walk the
    * physical plan and flag any shuffle exchange whose output carries a
    * raw text or embedding column — the scale-killer class (wide columns
    * crossing the wire for something an aggregate or narrow projection
    * should have reduced first). Exit code 1 if any are found. */
  private def audit(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val wide = Set("text", "embedding")
    var hits = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        plan.foreach {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            val carried = e.output.map(_.name.toLowerCase)
              .filter(n => wide.exists(n.contains))
            if (carried.nonEmpty) {
              hits += 1
              println(s"WIDE-SHUFFLE $name: ${carried.mkString(",")}")
            }
          case _ =>
        }
      } catch { case e: Throwable =>
        println(s"AUDIT-ERROR $name: ${e.getClass.getSimpleName}")
      }
    }
    println(s"audit: $hits wide shuffles across " +
      s"${graft.SparkEntry.queries.size} queries")
    spark.stop()
    if (hits > 0) sys.exit(1)
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
