package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing plan — the step between a curated corpus
  * and a token-budgeted training run: lay every document's tokens out
  * on ONE contiguous global token stream (corpus order = doc_id order,
  * the deterministic order the JSONL exporter writes), cut the stream
  * into fixed-length training sequences, and emit, per document, which
  * sequences its tokens land in. This is GPT-style contiguous packing
  * (documents straddle sequence boundaries; no padding, no packing
  * loss) — the alternative first-fit bin packing is a different op with
  * a sequential greedy core that does not belong on a 100 TB corpus.
  *
  * Output per non-empty document: `doc_id, n_tok, start_tok` (global
  * stream offset), `start_seq` / `end_seq` (first/last sequence index
  * touched), `start_off` (offset inside the first sequence), `n_seqs`
  * (= end_seq − start_seq + 1, the straddle count). Zero-token docs
  * contribute nothing to the stream and emit no row. The inverse
  * lookup (sequence → contributing docs) is a `sequence(start_seq,
  * end_seq)` explode away — deliberately not materialized here, since
  * its row count is corpus tokens / seqLen × straddle factor and most
  * consumers (shard writers, curriculum samplers) want the per-doc
  * form.
  *
  * Scale shape: the only non-map step is the global running token sum,
  * computed with the two-phase distributed prefix scan
  * ([[graft.operators.PrefixSum]], constant key) — NOT an un-partitioned
  * window, whose single task would serialize the whole corpus through
  * one executor. Everything after the scan is arithmetic on (start_tok,
  * n_tok): `DIV`/`pmod` per row, no further shuffle. At 100 TB the scan
  * is two linear passes over range-balanced partitions, and the result
  * is exactly reproducible because (doc_id) is a total order.
  */
object Packing {

  /** The inverse view of [[packPlan]]: per training SEQUENCE, how many
    * documents contribute and how many of its token slots each fills —
    * the manifest a data-loader shard reads. Each doc row explodes to
    * its `sequence(start_seq, end_seq)` span (bounded by the straddle
    * count, so the explode is O(rows + total straddles), never
    * O(tokens)) and contributes `min(end, (s+1)·L) − max(start, s·L)`
    * clipped tokens to sequence s. Every sequence sums to exactly
    * `seqLen` tokens except the last partial one — the invariant the
    * spec pins and the oracle re-derives.
    */
  def sequenceManifest(docs: DataFrame, seqLen: Long): DataFrame = {
    val plan = packPlan(docs, seqLen)
    plan
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        (col("start_tok") + col("n_tok")).as("end_tok"),
        explode(sequence(col("start_seq"), col("end_seq"))).as("seq_id"))
      .withColumn("tok_in_seq",
        least(col("end_tok"), (col("seq_id") + 1) * seqLen) -
          greatest(col("start_tok"), col("seq_id") * seqLen))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok_in_seq")).as("n_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  def packPlan(docs: DataFrame, seqLen: Long): DataFrame =
    packPlanFromCounts(docs.select(col("doc_id"),
      coalesce(size(TextStats.tokens(col("text"))), lit(0))
        .cast("long").as("n_tok")), seqLen)

  /** [[packPlan]] over already-computed per-doc token counts (doc_id,
    * n_tok) — the form a pipeline whose upstream stages already
    * tokenized uses, so the corpus is not re-tokenized just to pack.
    *
    * `keep` names extra attribution columns of `counts` to CARRY
    * through the scan into the output (after the standard pack
    * columns): per-doc metadata (lang, source) rides the two linear
    * passes instead of being re-attached by a manifest-sized join
    * afterwards. Row-identical to the join form — the pack emits one
    * row per n_tok > 0 doc and the carried values are that row's own.
    * Empty `keep` (every pre-existing caller) leaves the plan
    * byte-identical.
    */
  def packPlanFromCounts(counts: DataFrame, seqLen: Long,
      keep: Seq[String] = Nil): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = counts.select(lit(0L).as("__k") +: col("doc_id") +:
      col("n_tok").cast("long").as("n_tok") +: keep.map(col): _*)
    val cum = graft.operators.PrefixSum
      .cumSumByKey(base, "__k", Seq("doc_id"), "n_tok")
    withSeqFields(cum.filter(col("n_tok") > 0)
      .select(col("doc_id") +: col("n_tok") +:
        (col("cum") - col("n_tok")).as("start_tok") +: keep.map(col): _*),
      seqLen, keep)
  }

  /** The derived sequence fields from (doc_id, n_tok, start_tok) — ONE
    * expression set shared by [[packPlanFromCounts]] and the
    * append-to-stream path ([[graft.queries.Curation.incrementalIngest]]
    * shifts `start_tok` by the store's stream length and re-derives),
    * so an appended manifest can never disagree with a from-scratch one
    * on how offsets map to sequences.
    */
  private[graft] def withSeqFields(df: DataFrame, seqLen: Long,
      keep: Seq[String] = Nil): DataFrame =
    df.select(Seq(col("doc_id"), col("n_tok"), col("start_tok"),
      expr(s"start_tok DIV $seqLen").as("start_seq"),
      pmod(col("start_tok"), lit(seqLen)).as("start_off"),
      expr(s"(start_tok + n_tok - 1) DIV $seqLen").as("end_seq")) ++
      keep.map(col): _*)
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + lit(1L))
}
