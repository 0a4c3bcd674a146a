package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded top-k typed aggregate: keeps the k largest (orderKey, payload)
  * pairs per group in a size-k min-heap.
  *
  * Scale rationale: `row_number().over(partitionBy(key).orderBy(v))` +
  * `filter(rn <= k)` materializes and SORTS every group in full; this
  * aggregate carries at most k rows per group through partial aggregation
  * (map-side combine), so the shuffle and memory are O(k · groups)
  * regardless of group size — the difference between sorting 100 TB and
  * heap-scanning it.
  *
  * Ties broken toward the smaller tiebreak long (deterministic).
  * Output: payload array sorted by (orderKey desc, tiebreak asc).
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

  // buffer: the current top-≤k, sorted (orderKey desc, tiebreak asc) —
  // a product-encoded Seq (Tungsten rows) rather than a kryo-blob heap:
  // the buffer crosses partial→final serialization on every group, and
  // kryo blobs measured ~2× slower end-to-end. For tiny k an insertion
  // into a sorted seq is as good as a heap.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(
      buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && ord.compare(x, buf.last) >= 0) buf
    else ((x +: buf).sorted(ord)).take(k)

  override def merge(
      a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
