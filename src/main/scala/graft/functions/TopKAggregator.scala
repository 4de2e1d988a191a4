package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator — the `Aggregator[IN,BUF,OUT]` extension
  * point (SURVEY §2.M; the reference's user-defined MapReduce reduce stage).
  *
  * Keeps at most k (score, payload) pairs in the buffer, so map-side partial
  * aggregation ships ≤k rows per key per task — the aggregation-based
  * alternative to a Window top-k when k is small and keys are many/skewed
  * (a hot key costs O(n·k) map-side worst case but O(n) for the common
  * below-cutoff row, and the shuffle carries k rows instead of the key's
  * whole group).
  *
  * The buffer is maintained sorted (score desc, id asc): reduce() is an O(1)
  * cutoff test + O(k) ordered insert — not a full re-sort per row — and
  * merge() is a linear merge of two sorted lists. Encoders are
  * ExpressionEncoders, so the buffer shuffles as Tungsten rows instead of
  * opaque Kryo blobs (columnar-prunable, no serialization round-trip cost).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"TopKAggregator requires k > 0, got $k")

  override def zero: List[(Double, Long)] = Nil

  /** Sort order: score desc, id asc (deterministic tie-break). */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    if (buf.lengthCompare(k) >= 0 && !before(in, buf.last)) buf // below cutoff — O(1)
    else {
      val (hd, tl) = buf.span(x => before(x, in))
      (hd ::: in :: tl).take(k)
    }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    @annotation.tailrec
    def go(x: List[(Double, Long)], y: List[(Double, Long)], n: Int,
        acc: List[(Double, Long)]): List[(Double, Long)] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (xs, Nil) => acc.reverse ::: xs.take(n)
        case (Nil, ys) => acc.reverse ::: ys.take(n)
        case (xh :: xt, yh :: _) if before(xh, yh) => go(xt, y, n - 1, xh :: acc)
        case (_, yh :: yt) => go(x, yt, n - 1, yh :: acc)
      }
    go(a, b, k, Nil)
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
