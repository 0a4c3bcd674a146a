package graft.tools

import java.lang.management.ManagementFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Volume probe for the multimodal decode seam (round-15 stretch item):
  * the mapPartitions decode of MAXIMAL conforming frames is the decode
  * family's per-task memory high-water mark — parsePnm caps dims at
  * 4096, so the worst legal payload is a 4096×4096 P6 plane (~50 MB of
  * pixels; as a filmstrip, w=2048 k=2 gives the same 4096-row area in
  * 2 frames). The fixture plants are ≤16 px wide, so nothing in the
  * registry ever exercises decode at the size bound; this probe builds
  * maximal filmstrips ON THE EXECUTORS (one Array.fill per row — no
  * driver materialization, no SQL repeat() string blowup) and runs each
  * decode-family seam over them with every JVM heap pool's peak-usage
  * counter reset per op. Reported per-task peak = (pool-peak delta) /
  * concurrent tasks — an upper estimate (all tasks share the local JVM)
  * but the number that sizes executor memory for a 1000-executor
  * cluster: tasks-per-executor × per-task-peak must fit the executor
  * heap next to shuffle/storage memory.
  *
  * Usage: DecodeVolumeAB [nDocs=64] [w=2048] [k=2]
  */
object DecodeVolumeAB {

  /** Deterministic conforming P6 filmstrip, built per-row executor-side:
    * header + w·(w·k)·3 pattern bytes (a moving gradient so the DCT and
    * resample paths see non-constant planes). */
  private def buildP6(id: Long, w: Int, k: Int): Array[Byte] = {
    val h = w * k
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    val seed = (id * 1103515245L + 12345L).toInt
    while (i < n) {
      out(header.length + i) = ((i + seed) * 31 >>> 3).toByte
      i += 1
    }
    out
  }

  private def heapPeakMb(): Double = {
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / 1e6
  }

  private def resetPeaks(): Unit = {
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(_.resetPeakUsage())
    System.gc() // settle the baseline so the peak delta is the op's own
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 64
    val w = if (args.length > 1) args(1).toInt else 2048
    val k = if (args.length > 2) args(2).toInt else 2
    require(w.toLong * k <= 4096, "h = w*k must stay within parsePnm's cap")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-decode-volume")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bytesPerDoc = 15L + w.toLong * w * k * 3
    def payloads = spark.range(nDocs.toLong)
      .repartition(cpus)
      .mapPartitions(_.map(id => (id, buildP6(id, w, k))))
      .toDF("doc_id", "payload")

    val m = graft.multimodal.Multimodal
    val ops: Seq[(String, () => Long)] = Seq(
      "decode_meta" -> (() =>
        m.decodeMetaFromPayloads(spark, payloads).count()),
      "frame_sample" -> (() =>
        m.sampleFramesFromPayloads(payloads).count()),
      "features" -> (() =>
        m.extractFeaturesFromPayloads(payloads).count()),
      "resize" -> (() =>
        m.resizeToBoxFromPayloads(spark, payloads).count()))

    // warmup: codegen + first-touch of the generation path (untimed)
    m.decodeMetaFromPayloads(spark, payloads).count()

    val concurrent = math.min(cpus, nDocs)
    val results = ops.map { case (name, run) =>
      resetPeaks()
      val base = heapPeakMb()
      val t0 = System.nanoTime()
      val rows = run()
      val sec = (System.nanoTime() - t0) / 1e9
      val peak = heapPeakMb()
      val perTask = (peak - base) / concurrent
      (name, rows, sec, peak - base, perTask)
    }
    val fields = results.map { case (name, rows, sec, delta, perTask) =>
      s""""$name":{"rows":$rows,"sec":${f"$sec%.2f"},""" +
        s""""jvm_peak_delta_mb":${f"$delta%.0f"},""" +
        s""""per_task_peak_mb":${f"$perTask%.1f"}}"""
    }
    println(
      s"""{"metric":"decode_volume","n_docs":$nDocs,"w":$w,"k":$k,""" +
        s""""bytes_per_doc":$bytesPerDoc,"concurrent_tasks":$concurrent,""" +
        fields.mkString(",") + "}")
    spark.stop()
  }
}
