package graft.tmp
import org.apache.spark.sql.SparkSession
object Expl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(0).split(",")) {
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
