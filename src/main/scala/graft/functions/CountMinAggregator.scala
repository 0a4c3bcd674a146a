package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed count-min sketch build as a typed aggregate — the third
  * mergeable sketch family next to [[BloomFilterAggregator]] (membership)
  * and the built-in HLL (distinct counts): approximate FREQUENCIES with a
  * one-sided error (never undercounts, overcounts by at most the hash
  * collision mass, bounded by N·depth/width with high probability).
  *
  * Same contract as the Bloom build: each input row contributes `Depth`
  * pre-computed row positions (codegen'd `pmod(xxhash64(seed_i, key),
  * Width)` projections), so the point-query side re-derives identical
  * positions with pure built-in expressions — no JVM hash math mirrored
  * anywhere. Buffer = the Depth×Width counter matrix flattened row-major;
  * partial buffers ADD elementwise (counter addition commutes), so
  * Catalyst plans map-side partial aggregation and one 32 KB array per
  * partition crosses the wire. The finished sketch is bounded model state
  * — broadcastable into an estimate expression at any corpus scale,
  * however many distinct keys the stream carried.
  */
object CountMinAggregator
    extends Aggregator[(Long, Long, Long, Long), Array[Long], Seq[Long]] {

  /** Hash rows (independent xxhash64 seeds). */
  val Depth: Int = 4

  /** Counters per row (power of two so pmod cost stays trivial). */
  val Width: Int = 1024

  private val Cells = Depth * Width

  override def zero: Array[Long] = new Array[Long](Cells)

  override def reduce(
      buf: Array[Long], pos: (Long, Long, Long, Long)): Array[Long] = {
    buf(pos._1.toInt) += 1
    buf(Width + pos._2.toInt) += 1
    buf(2 * Width + pos._3.toInt) += 1
    buf(3 * Width + pos._4.toInt) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Cells) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
