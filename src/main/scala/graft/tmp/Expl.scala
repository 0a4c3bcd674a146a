package graft.tmp
import org.apache.spark.sql.SparkSession

/** Throwaway plan dumper: Expl <query>[,query...] <sfDir> */
object Expl {
  def main(args: Array[String]): Unit = {
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
}
