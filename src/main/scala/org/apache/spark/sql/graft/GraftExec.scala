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
}
