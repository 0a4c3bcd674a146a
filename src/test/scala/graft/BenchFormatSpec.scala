package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact line contract whose violation killed the
  * round-6 gating record: the driver tail-captures stdout, so the FINAL
  * line must be the compact `"metric":"total"` summary with a size that
  * does not grow with the query count (round 6 embedded the ~4 KB
  * per-query map there and the truncated-from-the-front capture lost
  * the parseable head). Pure-function test — no SparkSession. */
class BenchFormatSpec extends AnyFunSuite {

  private val manyQueries =
    (1 to 500).map(i => s"q$i" -> i * 0.01).toMap

  private def lines(results: Map[String, Double]) =
    Bench.summaryLines(results, "/data/sf0.1",
      calibStart = 0.30, calibEnd = 0.31,
      calibIoStart = 0.20, calibIoEnd = 0.15, quietCalib = 0.30)

  test("final line is the total, compact, and bounded regardless of query count") {
    val Seq(detail, total) = lines(manyQueries)
    assert(total.startsWith("""{"metric":"total","value":"""))
    assert(!total.contains("\"queries\""),
      "per-query map leaked back into the final line (round-6 regression)")
    // bounded: scalars only — far under any plausible tail-capture window
    assert(total.length < 512, s"final line ${total.length}B")
    // the detail line carries the full map and comes FIRST
    assert(detail.startsWith("""{"metric":"queries""""))
    assert(detail.contains("\"q500\":"))
    Seq("value_normalized", "load_factor", "calib_start", "calib_end",
      "calib_io_start", "calib_io_end", "nqueries", "steal_pct").foreach(k =>
      assert(total.contains(s"\"$k\":"), s"missing $k"))
  }

  test("steal_pct is carried through and defaults to -1 (unreadable)") {
    val base = Map("a" -> 1.0)
    assert(lines(base)(1).contains("\"steal_pct\":-1.0"))
    val withSteal = Bench.summaryLines(base, "sf", 0.30, 0.31, 0.2, 0.15,
      0.30, Map.empty, stealPct = 0.0123)(1)
    assert(withSteal.contains("\"steal_pct\":0.0123"))
  }

  test("normalization only corrects when BOTH probes are inflated; failed probes leave raw") {
    def totalOf(s: String): Double =
      """"value":([0-9.E-]+)""".r.findFirstMatchIn(s).get.group(1).toDouble
    def normOf(s: String): Double =
      """"value_normalized":([0-9.E-]+)""".r
        .findFirstMatchIn(s).get.group(1).toDouble
    val base = Map("a" -> 6.0, "b" -> 4.0)
    // quiet box: raw == normalized
    val quiet = lines(base)(1)
    assert(totalOf(quiet) == 10.0 && normOf(quiet) == 10.0)
    // both probes 2x inflated -> normalized halves, raw untouched
    val hot = Bench.summaryLines(base, "sf", 0.60, 0.62, 0.2, 0.2, 0.30)(1)
    assert(totalOf(hot) == 10.0)
    assert(math.abs(normOf(hot) - 5.0) < 0.2)
    // one quiet probe -> min-of-probes says quiet stretches existed: raw stands
    val mixed = Bench.summaryLines(base, "sf", 0.60, 0.29, 0.2, 0.2, 0.30)(1)
    assert(normOf(mixed) == 10.0)
    // failed probe (-1) -> no correction
    val failed = Bench.summaryLines(base, "sf", -1.0, 0.60, 0.2, 0.2, 0.30)(1)
    assert(normOf(failed) == 10.0)
  }
}
