package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Num.{r => rnd}

/** Deduplication operators for a training-data pipeline (north-star ops):
  * exact (hash groupBy), MinHash+LSH banding, 16-bit SimHash, and n-gram
  * Jaccard verification — arithmetic expressible identically in DuckDB for
  * the oracle.
  *
  * Scale shape: exact dedup is one shuffle on the dedup key; MinHash is a
  * narrow per-row signature (no explode of tokens), a bands-explode of
  * constant factor B, one shuffle on the band key, and Jaccard
  * verification only on candidate pairs — the classic LSH path that keeps
  * the candidate set ~linear instead of the O(n^2) all-pairs join. Skewed
  * buckets (boilerplate-heavy corpora) are the known hazard: cap bucket
  * size or salt before the pair join at extreme scale.
  */
object Dedup {

  import TextStats.{P, tokenCodes, tokens}

  /** MinHash parameters: K independent (a*x+b) mod P permutations,
    * BANDS bands of ROWS rows (K = BANDS*ROWS).
    */
  val Bands = 4
  val Rows = 3
  val K: Int = Bands * Rows
  val A: Array[Long] = Array.tabulate(K)(i => 2L * i + 3)
  val B: Array[Long] = Array.tabulate(K)(i => 7L * i + 1)

  /** Distinct token-code set (the shingle set for Jaccard/MinHash). */
  def tokenSet(text: Column): Column = array_distinct(tokenCodes(tokens(text)))

  /** K-wide MinHash signature over the token set. */
  def minhashSignature(setCol: Column): Column =
    array((0 until K).map { i =>
      aggregate(setCol, lit(Long.MaxValue),
        (m, c) => least(m, (lit(A(i)) * c + lit(B(i))) % P))
    }: _*)

  /** Band key: rows of one band joined ':' (string key shuffles fine). */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      concat_ws(":",
        (0 until Rows).map(r => element_at(sig, b * Rows + r + 1)): _*)
    }: _*)

  /** Exact-duplicate groups keyed on raw text: (kept doc_id = min,
    * duplicate count). SURVEY R12-adjacent; one shuffle.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_doc_id"), col("dup_count"))

  /** LSH candidate pairs + exact Jaccard verification.
    * Returns (doc1, doc2, jaccard) with doc1 < doc2, jaccard rounded 4,
    * filtered to >= minJaccard.
    */
  def minhashPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sigs = docs.select(
      col("doc_id"), tokenSet(col("text")).as("tset"))
      .withColumn("bands", bandKeys(minhashSignature(col("tset"))))
    val exploded = sigs.select(
      col("doc_id"), col("tset"), posexplode(col("bands")).as(Seq("band", "key")))
    val l = exploded.select(
      col("band"), col("key"), col("doc_id").as("doc1"), col("tset").as("t1"))
    val r = exploded.select(
      col("band"), col("key"), col("doc_id").as("doc2"), col("tset").as("t2"))
    l.join(r, Seq("band", "key"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), col("t1"), col("t2"))
      .distinct()
      .withColumn("jaccard", rnd(
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_distinct(concat(col("t1"), col("t2")))).cast("double"), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** 16-bit SimHash over the token set: bit k of the signature is 1 when
    * at least half the tokens have bit k set in their code. Small enough
    * to mirror as 16 explicit CASE terms in SQL, same majority rule.
    */
  def simhash16(setCol: Column): Column = {
    val n = size(setCol).cast("long")
    (0 until 16).map { k =>
      val ones = aggregate(setCol, lit(0L),
        (acc, c) => acc + shiftright(c, k).bitwiseAND(1))
      when(ones * 2 >= n, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Word-bigram shingle codes (distinct), for n-gram Jaccard near-dup.
    * Index form mirrors the DuckDB generate_series oracle exactly; guarded
    * because Spark's sequence(1, 0) would DESCEND rather than be empty.
    */
  def bigramCodes(text: Column): Column = {
    val codes = tokenCodes(tokens(text))
    array_distinct(
      when(size(codes) >= 2,
        transform(sequence(lit(1), size(codes) - 1), i =>
          (element_at(codes, i) * 131 + element_at(codes, i + 1)) % P))
        .otherwise(array().cast("array<bigint>")))
  }
}
