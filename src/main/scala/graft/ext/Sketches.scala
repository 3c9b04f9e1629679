package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators (SURVEY §2.5's UDAF surface).
  *
  * MinhashUnion folds per-document token-code arrays into one K-wide
  * MinHash signature per group — the signature of the UNION of the
  * groups' token sets, because elementwise min is associative,
  * commutative and idempotent. That makes the aggregation state a
  * perfect mergeable sketch: partial states are K longs regardless of
  * input size, map-side combine does real work, and the shuffle carries
  * K longs per (group x partition). Two corpus signatures estimate
  * cross-corpus Jaccard as (# agreeing components)/K without ever
  * joining the corpora.
  */
/** Bounded top-k as a mergeable aggregation state: the per-group buffer
  * is at most k (score, id) pairs kept in (score desc, id asc) order, so
  * partial aggregation does the real work map-side and the shuffle
  * carries k tuples per (group × partition) — the shape a per-query
  * top-k needs at corpus scale, where the window-function formulation
  * (row_number over everything) would shuffle every scored row. The
  * total order (score desc, id asc) makes the result independent of
  * merge order.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  private val ord = Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size == k && ord.lteq(buf.last, x)) buf
    else (buf :+ x).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

class MinhashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  import Dedup.{A, B, K}
  private val P = TextStats.P

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], codes: Seq[Long]): Array[Long] = {
    codes.foreach { c =>
      var j = 0
      while (j < K) {
        val v = (A(j) * c + B(j)) % P
        if (v < buf(j)) buf(j) = v
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < K) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
