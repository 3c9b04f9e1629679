package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join without a nested-loop: chunk time into
  * fixed-width buckets, explode each interval to the buckets it covers,
  * equi-join on the bucket, and keep a matching pair only in the bucket
  * that contains max(start1, start2) — so overlapping pairs that share
  * several buckets surface exactly once WITHOUT a distinct() shuffle.
  *
  * Why this shape at 100 TB: Spark compiles a bare
  * `a.start <= b.end AND b.start <= a.end` join to
  * BroadcastNestedLoopJoin — O(n*m) comparisons and a broadcast of a
  * whole side. Bucketing turns it into a standard shuffled equi-join
  * whose cost is O(n * avg_span/bucket) — pick `bucketSeconds` near the
  * median interval length so the explode factor stays ~2. Long outlier
  * intervals fan out proportionally; cap/split them upstream if a single
  * interval can span days.
  *
  * Inputs need columns (`skey`, `start`, `end`) with `start <= end`
  * (epoch-second longs). Overlap is inclusive on both ends.
  */
object IntervalJoin {

  private def withBuckets(df: DataFrame, bucketSeconds: Long, side: String): DataFrame =
    df.select(
      col("skey").as(s"key$side"),
      col("start").as(s"start$side"),
      col("end").as(s"end$side"),
      explode(sequence(
        col("start").divide(bucketSeconds).cast("long"),
        col("end").divide(bucketSeconds).cast("long"))).as("bucket"))

  /** All overlapping cross-side pairs (key1 != key2 filtered by caller if
    * sides share an id space). Returns key/bound columns for both sides.
    */
  def overlapPairs(left: DataFrame, right: DataFrame, bucketSeconds: Long): DataFrame = {
    val l = withBuckets(left, bucketSeconds, "1")
    val r = withBuckets(right, bucketSeconds, "2")
    l.join(r, Seq("bucket"))
      .filter(col("start1") <= col("end2") && col("start2") <= col("end1"))
      // dedup-free: emit only where this bucket holds max(start1, start2)
      .filter(greatest(col("start1"), col("start2"))
        .divide(bucketSeconds).cast("long") === col("bucket"))
      .drop("bucket")
  }
}
