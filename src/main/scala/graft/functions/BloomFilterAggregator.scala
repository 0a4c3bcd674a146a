package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Bloom-filter build as a typed aggregate: each input row
  * contributes K pre-computed bit positions (computed in a codegen'd
  * projection as `pmod(xxhash64(seed_i, key), M_BITS)` so the probe side
  * can re-derive the identical positions with pure built-in expressions —
  * no JVM hash math has to be mirrored in SQL, which matters because ANSI
  * mode forbids the wrapping-multiply mixers a classic double-hash scheme
  * would use).
  *
  * Buffer = the M_BITS-bit set as longs; partial buffers OR together, so
  * Catalyst plans map-side partial aggregation and one 32 KB array per
  * partition crosses the wire — the canonical "build a filter over a huge
  * key set without collecting the keys" shape. The finished filter is
  * bounded MODEL state (like a k-means centroid matrix): small enough to
  * broadcast into a probe-side predicate at any corpus scale; size M_BITS
  * by the expected distinct-key count (~10 bits/key for ~1% FPR at k=3).
  *
  * No false negatives ever — downstream exact verification keeps results
  * exact while the filter only prunes work (see decontam_bloom).
  */
object BloomFilterAggregator
    extends Aggregator[(Long, Long, Long), Array[Long], Seq[Long]] {

  /** Filter width in bits (power of two so position masking is cheap). */
  val MBits: Int = 1 << 18
  private val Words = MBits / 64

  override def zero: Array[Long] = new Array[Long](Words)

  @inline private def set(buf: Array[Long], p: Long): Unit = {
    val i = (p & (MBits - 1)).toInt
    buf(i >>> 6) |= 1L << (i & 63)
  }

  override def reduce(buf: Array[Long], pos: (Long, Long, Long)): Array[Long] = {
    set(buf, pos._1); set(buf, pos._2); set(buf, pos._3)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
