package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star ops): media as opaque binary
  * columns with typed metadata, batch-oriented decode / feature-extract
  * over partitions.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below); everything Spark-side —
  * schema, batch iteration shape, partition-wise processing, metadata
  * struct — is real and tested. Swapping the stub for a JNI/codec call
  * changes no plan shape.
  *
  * Scale: mapPartitions gives the codec a whole partition per call
  * (amortizes model/codec init, the same batching rationale as Pandas-UDF
  * `mapInPandas` on the PySpark side); binary payloads stay off the
  * shuffle path (decode before any wide op, project features only).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      meta_width: Int,
      meta_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      head_byte: Int,
      byte_sum_mod: Long,
      feat_width: Int,
      feat_height: Int)

  /** === STUB DECODE ===
    * Stands in for a real image/audio decode (no codec libs in this
    * environment). Deterministic over bytes: size, first byte, and a
    * byte-sum checksum; "dimensions" derived from length. A real
    * implementation would decode `payload` per `mime` and emit true
    * dims/features with the SAME signature.
    */
  private def stubDecode(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum = (sum + (r.payload(i) & 0xff)) % 65536; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      n_bytes = r.payload.length.toLong,
      head_byte = if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
      byte_sum_mod = sum,
      feat_width = (r.payload.length % 640).toInt,
      feat_height = (r.payload.length % 480).toInt)
  }

  /** Partition-batched feature extraction: one iterator per partition so a
    * real codec initializes once per task, not per row.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // codec/session init would happen HERE, once per partition
      it.map(stubDecode)
    }
  }

  /** Frame sampling over an opaque binary payload: treat the payload as
    * fixed-size frames, keep every `everyN`-th, and slice the frame
    * bytes out with substring-on-binary — the video/audio frame-extract
    * plan shape (explode factor = n_frames/everyN; the full payload is
    * projected away right after slicing so only sampled frames ever
    * move downstream). A real codec would replace the byte slice with a
    * keyframe decode at the same positions.
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .withColumn("n_frames",
        floor(length(col("payload")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyN.toLong)))
          .as("frame_idx"),
        col("payload"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame"))

  /** Documents table as a synthetic media table (text bytes as payload) —
    * exercises the full binary-column path on driver-provided data.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    // null-safe at the boundary: a null document becomes an empty
    // payload (n_bytes 0, head_byte -1), not an NPE in the decode
    // kernel or a NOT_NULL violation on the primitive meta fields
    docs.select(
      col("doc_id").as("media_id"),
      coalesce(col("text"), lit("")).cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      (coalesce(col("n_chars"), lit(0L)) % 640).cast("int").as("meta_width"),
      (coalesce(col("n_chars"), lit(0L)) % 480).cast("int").as("meta_height"))
}
