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

  /** (doc_id, n_bigrams, avg_nll): per-document average negative
    * log-probability under the corpus bigram model. Documents with
    * fewer than 2 tokens have no bigrams and drop out (the oracle's
    * UNNEST does the same).
    */
  def bigramNll(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // ONE tokenize-kernel pass: the cached (doc_id, codes) table feeds
    // the bigram-pair derivation AND the vocabulary scalar — the pair
    // table itself stays uncached because re-deriving it per consumer
    // is a cheap zip+explode over cached arrays, not a kernel run.
    val toks = Dedup.cached(docs.select(col("doc_id"),
      TextStats.tokenCodesOf(col(textCol)).as("codes")))
    // (doc, a = history code, b = next code) per position; the shifted
    // side is sliced to the ACTUAL remaining length (no fixed cap — a
    // constant bound would silently drop bigrams of longer docs), and
    // zip_with pads the final position with null b, filtered out.
    // Bigrams are keyed EXACTLY by the (a, b) code pair — hashing the
    // pair into one value mod P would conflate distinct bigrams once
    // the corpus holds ~1e9 of them (birthday load at the advertised
    // scale), silently deflating NLL for exactly the garbled documents
    // the filter exists to catch. Two uniform longs join/aggregate as
    // well as one.
    val pairs = toks
      .select(col("doc_id"),
        explode_outer(zip_with(col("codes"),
          slice(col("codes"), lit(2), greatest(size(col("codes")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
      .select(col("doc_id"), col("pr.a").as("a"), col("pr.b").as("b"))
      .filter(col("b").isNotNull)
    val cA = pairs.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    val cAB = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    // vocabulary size for add-one smoothing: distinct token codes,
    // collected as a driver-side scalar (one long — the k-means-
    // centroid precedent) and inlined as a literal, so the smoothing
    // term doesn't ride a single-row nested-loop cross join through
    // every scored row
    val vs = toks
      .select(explode_outer(col("codes")).as("code"))
      .filter(col("code").isNotNull)
      .agg(countDistinct(col("code"))).first().getLong(0)
    val scored = pairs
      .join(cAB, Seq("a", "b"))
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
