package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator — the `Aggregator[IN,BUF,OUT]` extension
  * point (SURVEY §2.M; the reference's user-defined MapReduce reduce stage).
  *
  * Keeps at most k (score, payload) pairs in the buffer, so map-side partial
  * aggregation ships ≤k rows per key per task — the aggregation-based
  * alternative to a Window top-k when k is small and keys are many/skewed
  * (a hot key costs O(n log k) map-side, and the shuffle carries k rows
  * instead of the key's whole group). */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    trim(in :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
