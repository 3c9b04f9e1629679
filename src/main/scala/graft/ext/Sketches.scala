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
  *
  * NaN scores rank FIRST (`java.lang.Double.compare` descending treats
  * NaN as greater than +Inf) — the same placement `ORDER BY score DESC`
  * gives NaN in both Spark's window sort and DuckDB, so the mergeable
  * and window formulations agree on ALL inputs, including a NaN cosine
  * from a zero-norm embedding.
  *
  * Cost: the buffer keeps its sort invariant, so `reduce` is a single
  * O(k) positional insert (common case: one comparison against the
  * current worst, no allocation) and `merge` is a linear two-pointer
  * merge — vs the previous re-sort-per-row O(k log k) + full copy. At
  * k=100 that is ~10× less comparison work per surviving row and zero
  * work for the (overwhelming at corpus scale) below-threshold rows.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  // k = 0 would make reduce() call .last on an empty buffer the moment
  // its size-reached branch is taken — fail at construction instead
  require(k > 0, s"TopKByScore needs k > 0, got $k")
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // score desc, NaN first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size == k && ord.lteq(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => ord.gt(e, x))
      val pos = if (i < 0) buf.size else i
      val out = (buf.take(pos) :+ x) ++ buf.drop(pos)
      if (out.size > k) out.take(k) else out
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val av = a.toIndexedSeq; val bv = b.toIndexedSeq
    val out = Seq.newBuilder[(Double, Long)]
    var ai = 0; var bi = 0; var n = 0
    while (n < k && (ai < av.length || bi < bv.length)) {
      val takeA = bi >= bv.length ||
        (ai < av.length && ord.lteq(av(ai), bv(bi)))
      if (takeA) { out += av(ai); ai += 1 } else { out += bv(bi); bi += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKByScore]] with an exact integer score: (score desc, id asc) as
  * 64-bit comparisons, for count-valued rankings. The double-scored
  * variant packing `cnt * 2^31 - code` is only exact while the packed
  * value fits 53 bits (cnt < 2^22 ≈ 4.2M — a hot token in a large
  * corpus exceeds that easily); carrying (cnt, code) natively stays
  * exact at any corpus scale. Same mergeable buffer shape: ≤ k pairs
  * per (group × partition), single O(k) positional insert per
  * surviving row.
  */
class TopKByLong(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // score desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id asc
    }
  }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size == k && ord.lteq(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => ord.gt(e, x))
      val pos = if (i < 0) buf.size else i
      val out = (buf.take(pos) :+ x) ++ buf.drop(pos)
      if (out.size > k) out.take(k) else out
    }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val av = a.toIndexedSeq; val bv = b.toIndexedSeq
    val out = Seq.newBuilder[(Long, Long)]
    var ai = 0; var bi = 0; var n = 0
    while (n < k && (ai < av.length || bi < bv.length)) {
      val takeA = bi >= bv.length ||
        (ai < av.length && ord.lteq(av(ai), bv(bi)))
      if (takeA) { out += av(ai); ai += 1 } else { out += bv(bi); bi += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
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
