package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed aggregate over pre-hashed token longs
  * (same design as [[MinHashAggregator]]: explode tokens, xxhash64 them in
  * a codegen'd projection, fold per doc in plain JVM arithmetic).
  *
  * Buffer = 64 bit-vote counters; each token's hash bit j votes ±1 on
  * output bit j; finish() sets bits with positive votes. Mergeable ⇒
  * partial aggregation before the shuffle.
  */
object SimHashAggregator extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      j += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
