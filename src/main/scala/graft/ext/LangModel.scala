package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Num.{r => rnd}

/** Corpus-statistics language model — the perplexity-proxy quality
  * filter (KenLM-style): score every document by the average negative
  * log-probability of its token bigrams under an add-one-smoothed
  * bigram model trained on the corpus itself. Documents whose token
  * sequences are improbable under corpus statistics (garbled text,
  * boilerplate soup) score high and get filtered.
  *
  * Scale shape: one explode to (doc, a, ab) position pairs (ids + 64-bit
  * codes only), two map-side-combined count aggregates (history `a`,
  * bigram `ab`), joins back on uniformly-hashed keys (the history table
  * is vocabulary-sized — AQE broadcasts it; the bigram table shuffles on
  * the uniform hash), and a per-doc sum. No window, no driver loop; the
  * model IS the count tables.
  *
  * Cross-engine determinism: `ln` differs by 1 ULP between libm and the
  * JVM on rare inputs, and float summation is order-dependent. Both are
  * neutralized the same way q71 treats idf: each bigram's log-prob is
  * rounded to 4 decimals FIRST (few distinct (c_ab, c_a) combos, so the
  * 1-ULP risk is confined to exact .00005 boundaries), scaled to an
  * integer long, and summed with integer arithmetic — addition order
  * cannot matter. The final average is one double division, rounded.
  */
object LangModel {

  import TextStats.P

  private val MaxLen = 1 << 20

  /** (doc_id, n_bigrams, avg_nll): per-document average negative
    * log-probability under the corpus bigram model. Documents with
    * fewer than 2 tokens have no bigrams and drop out (the oracle's
    * UNNEST does the same).
    */
  def bigramNll(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val codes = TextStats.tokenCodesOf(col(textCol))
    // (doc, a = history code, ab = hashed bigram code) per position;
    // zip_with pads the shifted side with null, so the tail position
    // yields ab = null and is filtered on the generated column.
    // Cached (signature-cache lifecycle): three consumers shuffle this
    // table on DIFFERENT keys (a, ab, then ab again for scoring), so
    // exchange reuse can't deduplicate the tokenize+zip kernel —
    // uncached it would run over the corpus once per consumer.
    val pairs = Dedup.cached(docs
      .select(col("doc_id"),
        explode_outer(zip_with(codes, slice(codes, 2, MaxLen),
          (a, b) => struct(a.as("a"), ((a * 131 + b) % P).as("ab")))).as("pr"))
      .select(col("doc_id"), col("pr.a").as("a"), col("pr.ab").as("ab"))
      .filter(col("ab").isNotNull))
    val cA = pairs.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    val cAB = pairs.groupBy(col("ab")).agg(count(lit(1)).as("c_ab"))
    // vocabulary size for add-one smoothing: distinct token codes,
    // collected as a driver-side scalar (one long — the k-means-
    // centroid precedent) and inlined as a literal, so the smoothing
    // term doesn't ride a single-row nested-loop cross join through
    // every scored row
    val vs = docs
      .select(explode_outer(codes).as("code")).filter(col("code").isNotNull)
      .agg(countDistinct(col("code"))).first().getLong(0)
    val scored = pairs
      .join(cAB, Seq("ab"))
      .join(cA, Seq("a"))
      .select(col("doc_id"),
        // ln p(b|a) = ln((c_ab + 1) / (c_a + V)), rounded to 4 and
        // scaled to an integer long -> order-free summation
        floor(log((col("c_ab") + 1.0) / (col("c_a") + lit(vs)))
          * 10000 + 0.5).cast("long").as("lp4"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp4")).as("s4"))
      .select(col("doc_id"), col("n_bigrams"),
        rnd(-col("s4").cast("double") / (col("n_bigrams") * 10000.0), 4)
          .as("avg_nll"))
  }
}
