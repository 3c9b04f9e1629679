package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Packing, TextStats}
import graft.queries.Curation

/** STREAMING curation ingest — the q122 contract run continuously:
  * delta documents arrive on a stream, each micro-batch flows through
  * [[Curation.ingestDelta]] against the CURRENT store, and accepted
  * docs append to the store directory. The store is the ONLY durable
  * artifact this job writes:
  *
  *  - **idempotence is the dedup itself**: an at-least-once redelivery
  *    (restart replaying a batch whose append already committed)
  *    re-ingests docs that are now IN the store — stage 3 drops every
  *    one of them as an exact duplicate, so nothing appends twice. No
  *    transaction log, no sink-side dedup key: the operator's own
  *    semantics make the pipeline exactly-once-equivalent
  *    (CurationStreamSpec executes the crash window).
  *  - **the manifest is a VIEW, not a second write**: pack offsets
  *    depend on ARRIVAL order (batch, then doc_id), so the store
  *    carries `ingest_batch` and [[manifestView]] re-derives the full
  *    manifest deterministically — through the same distributed prefix
  *    scan and the same [[Packing.withSeqFields]] expressions as the
  *    batch paths, so a batch's view rows equal the manifest
  *    [[Curation.ingestDelta]] returned when it ran. One durable
  *    artifact means no cross-file crash-consistency window at all.
  *
  * At 100 TB: the store directory is the persisted curated table
  * (production would give it a table format with compaction); `emb`,
  * `holdout` and `trained` are the maintained side artifacts the batch
  * rounds already own (the embedding table, the frozen eval split, the
  * production ANN index). Per-batch work is delta-sized by the q122
  * scale argument — the stream never re-pairs the store with itself.
  */
object CurationStream {

  val StoreSchema = "doc_id BIGINT, lang STRING, source STRING, " +
    "n_chars BIGINT, text STRING, n_tok BIGINT, ingest_batch BIGINT"

  /** Token count materialized AT APPEND TIME. The manifest view reads
    * this column, never the text — which is what makes [[redactStore]]
    * possible: a compliance deletion nulls the content while the
    * frozen token count keeps every already-trained offset valid.
    */
  private def tokCount = coalesce(size(TextStats.tokens(col("text"))),
    lit(0)).cast("long").as("n_tok")

  /** The store as a frame — explicit schema, so a fresh (empty) store
    * directory reads as an empty corpus instead of failing inference.
    */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.schema(StoreSchema).parquet(storeDir)

  /** Seed the store from an initial batch-curated corpus (e.g. the
    * q117 stage-6 survivors), as ingest batch −1.
    */
  def initStore(curated: DataFrame, storeDir: String): Unit =
    curated
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"), tokCount, lit(-1L).as("ingest_batch"))
      .write.mode("overwrite").parquet(storeDir)

  /** The pack manifest derived from the store: the global token stream
    * in (ingest_batch, doc_id) order — exactly the order the appends
    * happened — through the shared prefix scan and sequence-field
    * expressions. Output adds `ingest_batch` to the q122 manifest
    * shape.
    */
  def manifestView(store: DataFrame,
      seqLen: Long = Curation.SeqLen): DataFrame = {
    val counts = store.select(lit(0L).as("__k"), col("ingest_batch"),
      col("doc_id"), col("n_tok"))
    val cum = graft.operators.PrefixSum
      .cumSumByKey(counts, "__k", Seq("ingest_batch", "doc_id"), "n_tok")
    Packing.withSeqFields(cum.filter(col("n_tok") > 0)
        .select(col("doc_id"), col("n_tok"),
          (col("cum") - col("n_tok")).as("start_tok")), seqLen)
      .join(store.select(col("doc_id"), col("lang"), col("source"),
        col("ingest_batch")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        col("start_tok"), col("start_seq"), col("start_off"),
        col("end_seq"), col("n_seqs"), col("ingest_batch"))
  }

  /** Start the ingest stream: raw delta docs (doc_id, lang, source,
    * n_chars, text) → clean → [[Curation.ingestDelta]] against the
    * current store → append accepted docs to `storeDir`.
    */
  def ingestStream(deltaStream: DataFrame, emb: DataFrame,
      trained: Seq[(Long, Seq[Float])], holdout: DataFrame,
      storeDir: String, checkpointDir: String): StreamingQuery = {
    new java.io.File(storeDir).mkdirs() // empty store = empty corpus
    deltaStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir)
        val clB = Curation.clean(batch)
        val manifest = Curation.ingestDelta(s,
          store.drop("ingest_batch"), holdout, clB, emb, trained)
        clB.join(manifest.select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"), tokCount,
            lit(batchId).as("ingest_batch"))
          .write.mode("append").parquet(storeDir)
        graft.ext.Dedup.clearSignatureCaches()
        ()
      }
      .start()
  }

  /** Compact the append-only store: per-batch appends accumulate one
    * file set per micro-batch, and at 100 TB the file COUNT, not the
    * byte volume, is what degrades every downstream scan (driver-side
    * listing, footer reads, task scheduling). Rewrites the store into
    * `targetFiles` files — content-identical, so [[manifestView]] and
    * every subsequent ingest are unchanged (spec-pinned). The read is
    * materialized (eager localCheckpoint) before the overwrite because
    * Spark cannot scan the directory it is replacing; production would
    * hand this to the table format's compaction instead.
    */
  def compactStore(spark: SparkSession, storeDir: String,
      targetFiles: Int = 4): Unit =
    readStore(spark, storeDir).localCheckpoint(true)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(storeDir)

  /** Compliance redaction (tombstones): null the CONTENT of the given
    * docs while keeping their identity, attribution and frozen `n_tok`
    * — every offset a trained model already consumed stays valid, and
    * [[manifestView]] is bit-identical before and after (spec-pinned).
    * Documented consequence: dedup protection for the redacted content
    * is gone WITH the content (signatures derive from text), so a
    * re-submission of the same content is accepted as new — which is
    * the correct reading of a deletion request.
    */
  def redactStore(spark: SparkSession, storeDir: String,
      ids: Seq[Long]): Unit =
    readStore(spark, storeDir)
      .withColumn("text",
        when(col("doc_id").isin(ids: _*), lit(null)).otherwise(col("text")))
      .withColumn("n_chars",
        when(col("doc_id").isin(ids: _*), lit(null)).otherwise(col("n_chars")))
      .localCheckpoint(true)
      .write.mode("overwrite").parquet(storeDir)
}
