package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.queries.Num.{r => rnd}

/** Text-analysis operators for a training-data pipeline (north-star ops):
  * token counting, quality scoring, language ID, and document
  * fingerprinting — formulas built from codegen'd array functions and
  * native kernels (zero Scala UDFs on the surface since the
  * `repetition_stats` kernel retired the last one), with arithmetic
  * chosen to be expressible identically in DuckDB SQL for the oracle
  * (integer polynomial hashes mod a 31-bit prime; explicit
  * cast-to-double divisions; fixed rounding).
  *
  * Scale: all per-row narrow transforms — no shuffle, no explode; a 100 TB
  * corpus maps straight through whole-stage codegen.
  */
object TextStats {

  /** Polynomial rolling-hash prime (fits products in a Long: p*131+127 < 2^63). */
  val P = 1000000007L

  /** Whitespace tokens, empties dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Per-token polynomial char hash: fold(31*acc + ascii(char)) mod P.
    * Declarative reference form — a triple-nested CodegenFallback chain;
    * kept for the bit-parity spec. Hot paths use [[tokenCodesOf]].
    */
  def tokenCodesHof(toks: Column): Column =
    transform(toks, t =>
      aggregate(
        transform(split(t, ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, c) => (acc * 31 + c) % P))

  /** Native tokenize+hash: text -> array<long>, one codegen'd JVM pass
    * (identical values to tokenCodesHof(tokens(text))).
    */
  def tokenCodesOf(text: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.tokenCodes(text)

  /** Document fingerprint: rolling hash over token codes in order —
    * fold(131*acc + code) mod P. Identical text => identical fingerprint;
    * order-sensitive (the reference has no equivalent; this is the
    * training-pipeline extension op).
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.rollingHash(tokenCodesOf(text))

  /** Declarative fingerprint (parity-spec reference). */
  def fingerprintHof(text: Column): Column =
    aggregate(tokenCodesOf(text), lit(0L), (acc, c) => (acc * 131 + c) % P)

  /** Stopword marker lists per language for the n-gram/marker language-ID
    * heuristic. Deterministic, tiny, embedded in the plan.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "for"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "mit", "ist", "zu"),
    "es" -> Seq("el", "la", "los", "que", "de", "y", "es", "en"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "you", "zai", "ta"))

  /** Count of tokens present in a marker list. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  /** Predicted language: argmax of marker counts, ties broken by the
    * declaration order of [[langMarkers]]. Implemented as one
    * `array_max` over (count, -index, lang) structs — the earlier
    * when/otherwise fold embedded the growing best-count expression
    * twice per step, so the final tree re-evaluated the lambda-bearing
    * markerCount subtrees ~41 times per row (lambdas are excluded from
    * subexpression elimination); here each count evaluates exactly
    * once. Lexicographic struct max = max count, then max -index
    * (earliest language) — identical semantics to the strict-> fold.
    */
  def langId(toks: Column): Column = {
    val cands = langMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      struct(markerCount(toks, markers).as("c"),
        lit(-i).as("negidx"), lit(lang).as("lang"))
    }
    array_max(array(cands: _*)).getField("lang")
  }

  /** English stopwords used by the quality score. */
  val stopwords: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is",
    "for", "on", "with")

  /** Plain-Scala reference for [[repetitionStats]]'s counts — retired
    * from the hot path (the native `repetition_stats` kernel replaced
    * the ScalaUDF) but kept, with the UDF wrapper below, as the
    * bit-parity pin the other kernels all have (VecMathSpec).
    */
  private def repStatsScala(text: String): (Long, Long, Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val n = toks.length
    val cnt = new java.util.HashMap[String, Int]()
    toks.foreach(t => cnt.merge(t, 1, Integer.sum))
    var maxTok = 0
    cnt.values.forEach(v => if (v > maxTok) maxTok = v)
    val big = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + 1 < n) {
      big.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
      i += 1
    }
    var maxBig = 0
    big.values.forEach(v => if (v > maxBig) maxBig = v)
    (n.toLong, cnt.size.toLong, maxTok.toLong, maxBig.toLong)
  }

  private val repStatsUdf =
    org.apache.spark.sql.functions.udf((text: String) => repStatsScala(text))

  /** UDF form of the repetition stats (struct fields `_1.._4`) — the
    * parity reference only; never in a hot path.
    */
  def repetitionStatsUdf(text: Column): Column =
    repStatsUdf(coalesce(text, lit("")))

  /** Repetition statistics per document (Gopher-style quality filter
    * ingredients): struct(n_tokens, n_distinct, top_tok_freq,
    * top_bigram_freq) — token count, EXACT distinct-token count (by
    * string, not hash: the repetition screen must not conflate words a
    * hash collides), and the modal token/word-bigram frequencies. One
    * native codegen'd JVM pass per row (graft.ext.VecMath.repStats —
    * the last ScalaUDF on the surface, retired): mode-of-a-list in
    * column algebra is a quadratic CodegenFallback HOF chain (count
    * each distinct against the whole list), the measured ~100x trap
    * the other kernels avoid.
    */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graft.GraftColumns
      .repetitionStats(coalesce(text, lit("")))

  /** Vocabulary-richness report over a SORTED token-code array: type
    * count, hapax count (codes occurring exactly once in the doc) and
    * the derived type-token / hapax ratios — the vocabulary-diversity
    * screen complementary to [[repetitionStats]] (mode-of-a-list in its
    * own native kernel; these stay pure column algebra). Run-boundary scan:
    * position i of the sorted array is a hapax iff it differs from both
    * neighbours. Entirely narrow — the sort happens INSIDE the row, so a
    * 100 TB corpus maps straight through with no explode and no shuffle
    * (the groupBy formulation would shuffle every token). Neighbour
    * indices are clamped with greatest/least so ANSI mode can never see
    * an out-of-range index: at a clamped position the other disjunct is
    * already true, so the self-comparison is unreachable in the result.
    *
    * Shape: the three counts come from the native codegen'd
    * `vocab_stats` expression (one JVM pass: tokenize + hash + sort +
    * run-scan, graft.ext.VecMath.vocabStats), bound as an attribute in
    * a first projection so the ratio stage references computed longs.
    * The declarative staged-HOF formulation survives as
    * [[vocabRichnessHof]] for the bit-parity spec — and as the
    * documentation of the trap it avoids: the sorted array must be
    * bound BEFORE the hapax lambda references it, because
    * lambda-bearing trees are excluded from subexpression elimination
    * (the langId "~41 evaluations per row" trap documented above), so
    * an inlined sort would re-tokenize and re-sort the document once
    * per element_at PER SCAN POSITION — O(n² log n) per doc.
    *
    * Takes and returns a frame (id columns pass through; `textCol` is
    * consumed): per-doc output (ids…, n_tokens, n_types, n_hapax, ttr,
    * hapax_ratio).
    */
  def vocabRichness(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    def bt(c: String) = col("`" + c.replace("`", "``") + "`")
    // the internal binding would be ambiguous against a same-named
    // pass-through column — fail loud (the JsonlExport guard shape);
    // a pass-through column named like one of the five OUTPUTS would
    // duplicate that name and surface as an ambiguous-reference
    // AnalysisException in the ratio stage instead — same guard
    val reserved = Seq("__vs", "n_tokens", "n_types", "n_hapax",
      "ttr", "hapax_ratio")
    val clash = df.columns.filterNot(_ == textCol).filter(reserved.contains)
    require(clash.isEmpty,
      s"input column(s) ${clash.mkString(", ")} collide with " +
        "vocabRichness' internal binding / output names; rename them first")
    val keep = df.columns.filterNot(_ == textCol)
    val counted = df.select(keep.map(bt) :+
      org.apache.spark.sql.graft.GraftColumns
        .vocabStats(coalesce(bt(textCol), lit(""))).as("__vs"): _*)
      .select(keep.map(bt) :+
        col("__vs").getField("n_tokens").as("n_tokens") :+
        col("__vs").getField("n_types").as("n_types") :+
        col("__vs").getField("n_hapax").as("n_hapax"): _*)
    counted.select(keep.map(bt) :+ col("n_tokens") :+ col("n_types") :+
      col("n_hapax") :+
      when(col("n_tokens") > 0L,
        rnd(col("n_types").cast("double") / col("n_tokens").cast("double"), 4))
        .as("ttr") :+
      when(col("n_tokens") > 0L,
        rnd(col("n_hapax").cast("double") / col("n_tokens").cast("double"), 4))
        .as("hapax_ratio"): _*)
  }

  /** Declarative staged-HOF reference for [[vocabRichness]]'s counts
    * (array_sort + clamped-index run-boundary filter) — kept for the
    * bit-parity spec, the tokenCodesHof discipline.
    */
  def vocabRichnessHof(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    def bt(c: String) = col("`" + c.replace("`", "``") + "`")
    val reservedHof = Seq("__srt", "n_tokens", "n_types", "n_hapax")
    val clash = df.columns.filterNot(_ == textCol).filter(reservedHof.contains)
    require(clash.isEmpty,
      s"input column(s) ${clash.mkString(", ")} collide with " +
        "vocabRichnessHof's internal binding / output names; rename them first")
    val keep = df.columns.filterNot(_ == textCol)
    val srtBound = df.select(keep.map(bt) :+
      array_sort(coalesce(tokenCodesOf(bt(textCol)),
        array().cast("array<long>"))).as("__srt"): _*)
    val srt = col("__srt")
    val n = size(srt).cast("long")
    val hapax = when(n === 0L, lit(0)).otherwise(
      size(filter(sequence(lit(1L), n), i =>
        (i === 1L || element_at(srt, i.cast("int")) =!=
          element_at(srt, greatest(i - 1L, lit(1L)).cast("int"))) &&
          (i === n || element_at(srt, i.cast("int")) =!=
            element_at(srt, least(i + 1L, n).cast("int"))))))
    srtBound.select(keep.map(bt) :+
      n.as("n_tokens") :+
      size(array_distinct(srt)).cast("long").as("n_types") :+
      hapax.cast("long").as("n_hapax"): _*)
  }

  /** Quality heuristics bundle; every double rounded for oracle parity. */
  def statsColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val totalTokChars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val stopCnt = markerCount(toks, stopwords).cast("long")
    Seq(
      length(text).cast("long").as("n_chars_calc"),
      nTok.as("n_tokens"),
      rnd(totalTokChars.cast("double") / nTok.cast("double"), 4).as("avg_token_len"),
      stopCnt.as("n_stopwords"),
      rnd(stopCnt.cast("double") / nTok.cast("double"), 4).as("stopword_ratio"),
      rnd(
        least(lit(1.0), nTok.cast("double") / lit(50.0)) * 0.5 +
          (lit(1.0) - abs(stopCnt.cast("double") / nTok.cast("double") - lit(0.4))) * 0.5,
        4).as("quality_score"))
  }
}
