package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: salt the skewed (big) side
  * into `buckets` sub-keys and replicate the other side once per bucket,
  * so one hot key's rows spread over `buckets` reducers instead of
  * melting a single one.
  *
  * Exactness: every left row keeps exactly one salt and the right side
  * carries every salt for its key, so the salted join produces exactly
  * the plain join's rows (AdvancedOpsSpec compares multisets).
  *
  * When to use: AQE's skew-join split (`spark.sql.adaptive.skewJoin`)
  * already splits oversized partitions at runtime and should be the
  * first resort; explicit salting remains for (a) aggregation-state
  * skew that AQE can't split, and (b) deterministic plans in pipelines
  * where a mid-run re-plan is unwanted. Cost: the small side is
  * materialized `buckets`× — size it like a `buckets`-way broadcast.
  */
object Skew {

  /** Equi-join `left(keyL) == right(keyR)` with the left side salted by
    * `pmod(hash(saltFrom), buckets)`. `saltFrom` should be a
    * high-cardinality left column (a row id) so salt spreads evenly.
    */
  def saltedEquiJoin(left: DataFrame, keyL: String, saltFrom: Column,
                     right: DataFrame, keyR: String, buckets: Int): DataFrame = {
    // buckets = 0 would make pmod(_, 0) null on the left while the right
    // explodes sequence(0, -1) — a silently EMPTY join, not an error
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val l = left.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l(keyL) === r(keyR) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
