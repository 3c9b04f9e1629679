package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Execution helpers that need the sql-package seam. */
object GraftExec {

  /** Clone of the calling thread's Spark local properties (job group,
    * description, scheduler pool, SQL execution id) — the package-
    * private surface `SparkContext.getLocalProperties` clones through
    * for thread inheritance. [[graft.ext.DriverPool]] uses the pair to
    * run overlapped driver actions under the submitter's properties.
    */
  def cloneLocalProperties(
      sc: org.apache.spark.SparkContext): java.util.Properties = {
    val out = new java.util.Properties()
    val cur = sc.getLocalProperties
    val it = cur.stringPropertyNames().iterator()
    while (it.hasNext) { val k = it.next(); out.setProperty(k, cur.getProperty(k)) }
    out
  }

  def setLocalProperties(sc: org.apache.spark.SparkContext,
      props: java.util.Properties): Unit =
    sc.setLocalProperties(props)

  /** Wrap an RDD of InternalRows as a DataFrame (LogicalRDD leaf) —
    * the internal twin of `createDataFrame(RDD[Row], schema)` without
    * the external-Row encode pass (guide §1.4's warned cost: `.rdd`
    * plus `createDataFrame` pay interpreted Row decode/encode per
    * field). Rows must be immutable (copied) — the standard
    * internalCreateDataFrame contract.
    */
  def internalRowsToDf(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The leaf RDD of a checkpointed frame (its analyzed plan is a
    * LogicalRDD), so stage-boundary checkpoints can be tracked for
    * EXPLICIT release: `Dataset.unpersist` only consults the cache
    * manager and never frees checkpoint blocks, which otherwise live
    * until the RDD is GC'd via ContextCleaner — nondeterministic in a
    * long-lived session (the round-16 review's accumulation finding).
    */
  def leafRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Eager localCheckpoint AND row count in ONE Spark action.
    * `Dataset.localCheckpoint(eager = true)` materializes the
    * checkpoint by running an internal `rdd.count()` and DISCARDS the
    * number — so a staged pipeline that checkpoints every stage and
    * needs each stage's row count (the streaming curation ingest) pays
    * a second, pure-overhead job per stage. This replicates the same
    * construction — copy the unsafe rows, mark the RDD
    * locally-checkpointed, materialize via count, wrap the
    * materialized RDD as a leaf plan — and keeps the count.
    */
  def localCheckpointCounted(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.count()
    (spark.internalCreateDataFrame(rdd, df.schema), n)
  }

  /** [[localCheckpointCounted]] that ALSO returns one long column's
    * values: checkpoint, row count and key collection ride the SAME
    * single action (the materializing job's per-partition iterators
    * yield the keys instead of discarding them). For the streaming
    * ingest's accepted rows, whose doc_ids feed the sidecar merge —
    * previously a separate collect job over the fresh leaf.
    *
    * The key collection is CAPPED: each partition retains at most
    * cap+1 keys while still counting every row, so a backlog-replay
    * burst cannot turn the count action into an O(batch) driver
    * collect — over the cap the keys come back None (callers fall
    * back to their distributed forms) and the count stays exact.
    * Total ≤ cap implies no partition truncated (a truncating
    * partition alone holds ≥ cap+2 rows), so a Some is always the
    * complete key set.
    */
  def localCheckpointCountedKeyed(df: DataFrame, keyOrdinal: Int,
      cap: Long): (DataFrame, Long, Option[Array[Long]]) = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val perPart = math.min(cap + 1L, Int.MaxValue.toLong).toInt
    val parts = spark.sparkContext.runJob(rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        var n = 0L
        while (it.hasNext) {
          val r = it.next()
          if (buf.length < perPart) buf += r.getLong(keyOrdinal)
          n += 1L
        }
        (n, buf.toArray)
      })
    val total = parts.iterator.map(_._1).sum
    val ids =
      if (total > cap) None
      else Some(Array.concat(parts.iterator.map(_._2).toIndexedSeq: _*))
    (spark.internalCreateDataFrame(rdd, df.schema), total, ids)
  }
}
