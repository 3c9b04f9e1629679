package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Execution helpers that need the sql-package seam. */
object GraftExec {

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
    */
  def localCheckpointCountedKeyed(df: DataFrame,
      keyOrdinal: Int): (DataFrame, Long, Array[Long]) = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val chunks = spark.sparkContext.runJob(rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
        it.map(_.getLong(keyOrdinal)).toArray)
    val ids = Array.concat(chunks.toIndexedSeq: _*)
    (spark.internalCreateDataFrame(rdd, df.schema), ids.length.toLong, ids)
  }
}
