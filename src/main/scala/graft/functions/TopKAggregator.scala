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
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)],
      Seq[(Double, Long)]] {

  // min-heap on (orderKey asc, tiebreak desc): the head is the weakest
  // element, evicted first
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

  override def reduce(
      h: mutable.PriorityQueue[(Double, Long)],
      x: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    h.enqueue(x)
    while (h.size > k) h.dequeue()
    h
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(h: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    h.toSeq.sortBy { case (v, id) => (-v, id) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    org.apache.spark.sql.Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
