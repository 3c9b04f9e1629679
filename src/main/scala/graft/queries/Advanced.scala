package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity}
import graft.operators.{IntervalJoin, Resample, Sessionize}
import graft.queries.Num.{r => rnd}

/** Round-2 operator wave: multi-level aggregation (rollup/grouping sets),
  * pivot, exact percentiles, sessionization, interval join, IVF ANN, and
  * SimHash-hamming near-dup — each with a DuckDB oracle.
  *
  * Money sums go through integer cents (floor(x*100+0.5) as BIGINT): sums
  * of doubles are order-dependent, integer sums are exact in any order —
  * the only way a distributed sum can hash-match a single-threaded oracle.
  */
object Advanced {
  type Q = (SparkSession, String) => DataFrame

  /** Session gap (seconds): ~median inter-event gap in `events`, so users
    * split into a handful of multi-event sessions.
    */
  val SessionGap = 21600L
  /** Interval-join bucket: 1 day — near the p90 session span, explode
    * factor ~2 per interval.
    */
  val Bucket = 86400L

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private def sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Sessionize.sessions(Tables.events(s, d), $"user_id", $"ts", SessionGap, $"event_id")
  }

  val queries: Map[String, Q] = Map(
    // Multi-level aggregation: ROLLUP with grouping flags.
    "q27_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping($"l_returnflag").cast("long").as("g_rf"),
          grouping($"l_linestatus").cast("long").as("g_ls"))
    }),

    // CUBE: all four grouping combinations in one pass.
    "q46_cube" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(floor($"o_totalprice" * 100 + 0.5).cast("long")).as("cents"),
          grouping($"o_orderstatus").cast("long").as("g_st"),
          grouping($"o_orderpriority").cast("long").as("g_pr"))
    }),

    // Ordered string aggregation: deterministic listagg via sorted
    // distinct values (raw collect_list order is partition-dependent).
    "q47_string_agg" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(array_join(array_sort(collect_set($"l_linestatus")), ",")
          .as("statuses"))
    }),

    // Pivot: order value (integer cents) by priority per status.
    "q28_pivot" -> ((s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d).select(
        $"o_orderstatus", $"o_orderpriority",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      val pv = base.groupBy($"o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(sum($"cents"))
      pv.select(
        $"o_orderstatus",
        col("1-URGENT").as("p1_cents"),
        col("2-HIGH").as("p2_cents"),
        col("3-MEDIUM").as("p3_cents"),
        col("4-NOT SPECIFIED").as("p4_cents"),
        col("5-LOW").as("p5_cents"))
    }),

    // Exact interpolated percentiles (single shuffle, per-group sort).
    "q29_percentile" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          rnd(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          rnd(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // Gaps-and-islands sessionization of the event stream.
    "q30_sessionize" -> ((s, d) =>
      sessions(s, d).withColumnRenamed("skey", "user_id")),

    // Interval join: other users' events landing inside user 7's
    // sessions (bucketed equi-join, no nested loop).
    "q31_interval_join" -> ((s, d) => {
      import s.implicits._
      val u7 = sessions(s, d)
        .filter($"skey" === 7)
        .select($"session_seq".as("skey"),
          $"session_start".cast("long").as("start"),
          $"session_end".cast("long").as("end"))
      val pts = Tables.events(s, d)
        .filter($"user_id" =!= 7)
        .select($"event_id".as("skey"),
          $"ts".cast("long").as("start"), $"ts".cast("long").as("end"))
      // one user's sessions are dimension-sized: broadcast them so the
      // 600k-event side never shuffles (the hint rides through the
      // bucket-explode projection into the equi-join)
      IntervalJoin.overlapPairs(broadcast(u7), pts, Bucket)
        .groupBy($"key1".as("session_seq"))
        .agg(count(lit(1)).as("n_other_events"))
    }),

    // IVF ANN: coarse-quantize to 16 deterministic centroids, probe 2.
    "q32_ivf_ann" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)),

    // TRAINED IVF, end-to-end oracle-gated: one Lloyd iteration from the
    // first-16 seed under q40's quantization discipline (per-dim mean
    // rounded 1e-4 before the float32 cast — what makes distributed
    // training bit-reproducible and externally replayable), then the
    // same assignment/probe/topk plan as q32 with the trained centroids
    // injected. The oracle unrolls the iteration in SQL.
    "q101_ivf_trained" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
      Similarity.ivfTopK(emb, queryVecId = 0L, k = 10, nCentroids = 16,
        nprobe = 2, centroids = Some(trained))
    }),

    // BATCH IVF through the SAME trained index as q101: five queries,
    // per-query probe selection as a pure map (no driver round-trip per
    // query, unlike ivfTopK's probeCells), candidates broadcast-joined
    // on the probed cells, per-query top-k mergeable. The oracle
    // replays the Lloyd unroll verbatim from q101 and ranks per query
    // with a window — see Similarity.ivfBatchTopK.
    "q106_ivf_batch" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
      Similarity.ivfBatchTopK(emb, queryMaxId = 5L, k = 10, nCentroids = 16,
        nprobe = 2, centroids = Some(trained))
    }),

    // SemDeDup-style semantic dedup through the SAME trained index as
    // q101/q106: cluster-scoped cosine near-dup pairs (never cross-cell,
    // so pair generation is Θ(Σ|cell|²) instead of corpus²) → greedy
    // keep-smallest-id drop list → join back to documents. The oracle
    // replays the shared Lloyd unroll and the per-cell pair set.
    "q108_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
      Dedup.semanticDropList(emb, Tables.documents(s, d), trained,
        minCos = 0.35)
    }),

    // the same semantic drop list through the SQL table-function surface
    // (GraftExtensions.semantic_drop_list trains the q101 index and
    // splices semanticDropList's analyzed plan — gated against the
    // identical q108 oracle string).
    "q119_semdedup_sql" -> ((s, d) => {
      Tables.embeddings(s, d).createOrReplaceTempView("q119_emb")
      Tables.documents(s, d).createOrReplaceTempView("q119_docs")
      s.sql("""SELECT doc_id, cell, dup_of, max_cos, n_dups, lang, n_chars
               FROM semantic_drop_list('q119_emb', 'q119_docs', 0.35)""")
    }),

    // Product quantization + ADC (the ANN memory tier): m=4 subspaces
    // of 16 dims, 16-entry seed codebooks per subspace (the q32
    // untrained-centroid precedent, which is what lets the oracle
    // replay the whole pipeline), every doc reduced to 4 codes, query
    // scored by 4 exact-integer table lookups — the floats never enter
    // the scoring plan. See graft.ext.Pq.
    "q115_pq_adc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ext.Pq.adcTopK(emb, queryVecId = 0L, k = 10,
        graft.ext.Pq.seedCodebooks(emb, m = 4, ksub = 16))
    }),

    // IVF-PQ, the composed billion-scale serving shape: coarse probe
    // (q32's discipline) prunes to 2 of 16 cells, ADC (q115's
    // discipline) ranks only the survivors from their codes. Neither a
    // corpus scan nor a float read in the scoring plan.
    "q116_ivf_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.ext.Pq.ivfAdcTopK(emb, queryVecId = 0L, k = 10,
        graft.ext.Pq.seedCodebooks(emb, m = 4, ksub = 16))
    }),

    // SimHash64 near-dup pairs within hamming 3 (chunked LSH blocking).
    "q33_simhash64_pairs" -> ((s, d) =>
      Dedup.hammingPairs(Tables.documents(s, d), maxDist = 3)),

    // Built-in session_window run in batch (the streaming operator's
    // twin; watermark is a no-op in batch).
    "q34_session_window" -> ((s, d) =>
      graft.streaming.StreamOps.sessionCounts(
        Tables.events(s, d), "ts", "user_id", "3600 seconds", "0 seconds")),

    // Ranking-window family: rank/dense_rank share the measure ordering
    // (ties allowed); ntile gets a unique ordering — tile assignment
    // within ties is engine-dependent otherwise.
    "q35_rank_windows" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byQty = Window.partitionBy($"l_returnflag")
        .orderBy($"l_quantity")
      val unique = Window.partitionBy($"l_returnflag")
        .orderBy($"l_quantity", $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, d).select(
        $"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity",
        rank().over(byQty).cast("long").as("rnk"),
        dense_rank().over(byQty).cast("long").as("drnk"),
        rnd(percent_rank().over(byQty), 6).as("pr"),
        rnd(cume_dist().over(byQty), 6).as("cd"),
        ntile(4).over(unique).as("nt"))
    }),

    // Scalar subquery: orders above the global average value. The
    // average is over integer cents, so both engines divide the same
    // exact sum by the same count.
    "q36_scalar_subquery" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d).select(
        $"o_orderkey", $"o_custkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      val a = o.agg(avg($"cents").as("avg_cents"))
      o.join(broadcast(a))
        .filter($"cents" > $"avg_cents")
        .select($"o_orderkey", $"o_custkey", $"cents")
    }),

    // Gap-fill / forward-fill: densify each user's daily value series.
    "q37_gap_fill" -> ((s, d) => {
      import s.implicits._
      Resample.dailyForwardFill(
        Tables.events(s, d), $"user_id", $"ts", rnd(sum($"value"), 4))
        .withColumnRenamed("fkey", "user_id")
    }),

    // Semi-structured extraction: typed struct out of the JSON props
    // column, then a relational aggregate over the extracted field.
    "q39_json_extract" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      Tables.events(s, d)
        .withColumn("p", from_json($"props",
          StructType(Seq(StructField("k", LongType)))))
        .groupBy($"p.k".as("k"))
        .agg(count(lit(1)).as("n"), rnd(sum($"value"), 4).as("sum_value"))
    }),

    // Per-label centroid of the embedding column: posexplode to
    // (label, dim, component), one grouped average — the UDAF-free way
    // to aggregate vectors (shuffle carries label x dim keys only).
    "q40_vector_centroid" -> ((s, d) => {
      import s.implicits._
      Tables.embeddings(s, d)
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim".cast("long").as("dim"))
        .agg(rnd(avg($"v"), 4).as("centroid_val"))
    }),

    // Time-range window frame: per-user trailing-1-hour moving average
    // (RANGE frame over event-time seconds, not row counts).
    "q41_moving_avg" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".cast("long"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d).select(
        $"event_id", $"user_id", $"ts",
        rnd(avg($"value").over(w), 4).as("avg_1h"))
    }),

    // Relational set operations over derived key sets.
    "q42_set_ops" -> ((s, d) => {
      import s.implicits._
      val custN = Tables.customer(s, d).select($"c_nationkey".as("nationkey")).distinct()
      val suppN = Tables.supplier(s, d).select($"s_nationkey".as("nationkey")).distinct()
      custN.intersect(suppN).withColumn("set_op", lit("both"))
        .unionByName(custN.except(suppN).withColumn("set_op", lit("cust_only")))
        .unionByName(suppN.except(custN).withColumn("set_op", lit("supp_only")))
    }),

    // Fuzzy matching: DISTINCT part names within Levenshtein distance 3.
    // Semantics (and the oracle) are "same first token AND dist <= 3";
    // the physical block is the COMPOSITE key (first token, length band):
    // dist <= 3 implies a length difference <= 3, so with band width 4 a
    // matching pair sits in the same or an adjacent band — the left side
    // explodes into {band-1, band, band+1} and the equi-join covers every
    // qualifying pair exactly once (one delta matches). First-token-only
    // blocking keyed TPC-H's ~90-adjective vocabulary into O(n/90)
    // buckets → quadratic pair growth; the band dimension re-spreads
    // them. The thresholded levenshtein kernel prunes the DP early.
    // Dedup-before-match is the scale order: the quadratic step runs on
    // unique values, and results fan back out by equi-join.
    "q43_fuzzy_match" -> ((s, d) => {
      import s.implicits._
      val p = Tables.part(s, d).select($"p_name").distinct()
        .select($"p_name", split($"p_name", " ").getItem(0).as("tok"),
          floor(length($"p_name") / 4).cast("long").as("band"))
      val l = p.select($"tok",
        explode(array($"band" - 1, $"band", $"band" + 1)).as("band"),
        $"p_name".as("n1"))
      val r = p.select($"tok", $"band", $"p_name".as("n2"))
      l.join(r, Seq("tok", "band"))
        .filter($"n1" < $"n2")
        .withColumn("dist", levenshtein($"n1", $"n2", 3).cast("long"))
        .filter($"dist" >= 0)
        .select($"n1", $"n2", $"dist")
    }),

    // Data-quality audit in one pass + a referential-integrity anti-join:
    // the constraint checks a warehouse runs before publishing a table.
    "q45_data_audit" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val stats = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when($"l_quantity".isNull, 1L).otherwise(0L)).as("null_qty"),
        sum(when($"l_quantity" < 0 || $"l_quantity" > 50, 1L).otherwise(0L))
          .as("range_violations"),
        sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("null_shipdate"),
        countDistinct($"l_orderkey").as("distinct_orders"))
      val orphans = li.join(Tables.orders(s, d),
          $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      stats.join(broadcast(orphans))
    }),

    // Multiset (ALL) set operations: bag semantics preserve duplicates.
    "q49_multiset_ops" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_suppkey".as("k"))
      val os = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .select($"l_suppkey".as("k"))
      li.exceptAll(os).groupBy($"k").agg(count(lit(1)).as("n"))
    }),

    // Boolean aggregates per group (every/any/count_if).
    "q50_bool_aggs" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          every($"o_totalprice" > 1000.0).as("all_over_1k"),
          some($"o_totalprice" > 400000.0).as("any_over_400k"),
          count_if($"o_orderstatus" === "F").as("n_finished"))
    }),

    // Iterative fixpoint (recursive-CTE equivalent): reachability over
    // a deterministic edge set derived from click events.
    "q60_reachability" -> ((s, d) => {
      import s.implicits._
      val edges = Tables.events(s, d)
        .filter($"event_type" === "click")
        .select($"user_id".as("src"),
          pmod(floor($"value" * 7).cast("long"), lit(150L)).as("dst"))
        .distinct()
      graft.operators.Graph.reachable(s, edges, start = 0L)
        .groupBy()
        .agg(count(lit(1)).as("n_reachable"), sum($"node").as("node_sum"))
    }),

    // Array + conditional scalar families over the embedding table.
    "q59_array_funcs" -> ((s, d) => {
      import s.implicits._
      Tables.embeddings(s, d).select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        rnd(element_at($"embedding", 1).cast("double"), 6).as("first_val"),
        rnd(array_max($"embedding").cast("double"), 6).as("max_val"),
        rnd(array_min($"embedding").cast("double"), 6).as("min_val"),
        rnd(element_at(array_sort($"embedding"), 3).cast("double"), 6).as("third_smallest"),
        array_position(
          $"embedding", array_max($"embedding")).cast("long").as("argmax_pos"),
        coalesce(nullif($"label", lit(0)), lit(-1)).cast("long").as("label_or_neg1"),
        greatest($"label", lit(5)).cast("long").as("label_floor5"))
    }),

    // Text cleaning: digit scrub + whitespace normalization — the
    // regex-normalize pass before tokenization in a data-prep pipeline.
    "q57_text_clean" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(
        $"doc_id",
        trim(regexp_replace(
          regexp_replace($"text", "[0-9]+", "<NUM>"),
          " +", " ")).as("cleaned"),
        length(regexp_replace($"text", "[^a-z]", "")).cast("long")
          .as("n_alpha"))
    }),

    // Corpus n-gram analysis: top word bigrams by frequency
    // (explode -> count -> deterministic top-k).
    "q58_top_bigrams" -> ((s, d) => {
      import s.implicits._
      val toks = graft.ext.TextStats.tokens($"text")
      val bigrams = Tables.documents(s, d)
        .select(explode(zip_with(toks, slice(toks, 2, 1 << 20),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
        .filter($"bg".contains(" "))  // zip_with pads the tail: drop the
                                      // lone last token (concat_ws skips
                                      // its null partner)
      bigrams.groupBy($"bg")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bg".asc)
        .limit(20)
    }),

    // Capstone composition: the LLM data-prep pipeline end-to-end —
    // exact dedup (keep lowest doc_id per text), token-count quality
    // floor, deterministic hash split, per-(split, lang) corpus stats.
    // Every stage is one of this engine's operators; one oracle checks
    // the whole composition.
    "q55_llm_prep_pipeline" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"text").orderBy($"doc_id")
      val kept = Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
      val toks = graft.ext.TextStats.tokens($"text")
      val enriched = kept.withColumn("n_tokens", size(toks).cast("long"))
      val filtered = enriched.filter($"n_tokens" >= 10)
      val split = filtered
        .withColumn("bucket", pmod($"doc_id" * 2654435761L, lit(100L)))
        .withColumn("split", when($"bucket" < 90, "train").otherwise("eval"))
      split.groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
    }),

    // Statistical aggregate family (sample variance/stddev, correlation,
    // covariance) — definitionally identical across engines.
    "q56_stats_family" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          rnd(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          rnd(var_samp($"l_quantity"), 4).as("var_qty"),
          rnd(corr($"l_quantity", $"l_discount"), 6).as("corr_qd"),
          rnd(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd"))
    }),

    // Date/time expression family over event time.
    "q53_datetime_funcs" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d).select(
        $"event_id",
        year($"ts").cast("long").as("y"),
        month($"ts").cast("long").as("m"),
        dayofmonth($"ts").cast("long").as("dom"),
        (dayofweek($"ts") - 1).cast("long").as("dow_sun0"),
        hour($"ts").cast("long").as("h"),
        date_format($"ts", "yyyy-MM").as("ym"),
        datediff(to_date($"ts"), to_date(lit("2024-01-01"))).cast("long").as("days_since"))
    }),

    // String expression family over part names.
    "q54_string_funcs" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d).select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        length($"p_name").cast("long").as("len"),
        substring($"p_name", 1, 5).as("head5"),
        instr($"p_name", "o").cast("long").as("first_o"),
        translate($"p_name", "aeiou", "AEIOU").as("voweled"),
        reverse(split($"p_name", " ")).getItem(0).as("last_word"),
        lpad($"p_partkey".cast("string"), 8, "0").as("padded_key"))
    }),

    // Deterministic train/test split: Knuth-hash bucket of the stable id
    // — reproducible across engines/runs/partitionings, unlike
    // randomSplit. 80/10/10 by bucket range.
    "q51_train_test_split" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("bucket", pmod($"doc_id" * 2654435761L, lit(100L)))
        .withColumn("split",
          when($"bucket" < 80, "train")
            .when($"bucket" < 90, "valid")
            .otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
    }),

    // Stratified sample via deterministic hash thresholds (same Knuth
    // multiplier as q51 with a salt, per-stratum fraction in permille).
    // Unlike `sampleBy` (engine-private RNG) this reproduces bit-exactly
    // across engines, runs, and partitionings — and at 100 TB it is a
    // pure map-side filter, no shuffle, no driver-held seeds.
    "q52_stratified_sample" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("bucket", pmod($"doc_id" * 2654435761L + 97L, lit(1000L)))
        .where(($"lang" === "en" && $"bucket" < 500) ||
               ($"lang" === "de" && $"bucket" < 200))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"), min($"doc_id").as("first_doc"))
    }),

    // Multimodal frame sampling: every 4th 16-byte frame sliced out of
    // the binary payload (compared as string — payloads are ASCII).
    "q48_frame_sample" -> ((s, d) => {
      import s.implicits._
      graft.ext.Multimodal.frameSample(
        graft.ext.Multimodal.mediaFromDocuments(Tables.documents(s, d)),
        frameBytes = 16, everyN = 4)
        .select($"media_id", $"frame_idx", $"frame".cast("string").as("frame_str"))
    }),

    // Typed Aggregator UDAF: per-language corpus MinHash-union signature
    // (mergeable sketch state — K longs per group regardless of corpus
    // size; map-side combine does the real work).
    "q44_corpus_minhash" -> ((s, d) => {
      import s.implicits._
      val mh = udaf(new graft.ext.MinhashUnion)
      val sigs = Tables.documents(s, d)
        .select($"lang", graft.ext.TextStats.tokenCodesOf($"text").as("codes"))
        .groupBy($"lang")
        .agg(mh($"codes").as("sig"))
      sigs.select(
        Seq($"lang") ++ (0 until graft.ext.Dedup.K).map(i =>
          element_at($"sig", i + 1).as(s"m$i")): _*)
    }),

    // Corpus-overlap matrix from the mergeable MinHash-union sketches
    // (q44): estimated Jaccard between every pair of language
    // sub-corpora as (# agreeing signature components)/K. The sketch
    // algebra payoff: cross-corpus overlap triage WITHOUT joining the
    // corpora — at 100 TB each corpus contributes one map-side-combined
    // aggregation producing K longs, and the pairwise matrix is
    // #corpora² sketch comparisons on broadcast-sized rows.
    "q74_corpus_overlap" -> ((s, d) => {
      import s.implicits._
      val mh = udaf(new graft.ext.MinhashUnion)
      val sigs = Tables.documents(s, d)
        .select($"lang", graft.ext.TextStats.tokenCodesOf($"text").as("codes"))
        .groupBy($"lang").agg(mh($"codes").as("sig"))
      val l = sigs.select($"lang".as("lang1"), $"sig".as("s1"))
      val r = sigs.select($"lang".as("lang2"), $"sig".as("s2"))
      l.join(r, $"lang1" < $"lang2")
        .select($"lang1", $"lang2",
          aggregate(zip_with($"s1", $"s2",
              (a, b) => when(a === b, 1L).otherwise(0L)),
            lit(0L), (acc, x) => acc + x).as("n_agree"))
        .select($"lang1", $"lang2", $"n_agree",
          rnd($"n_agree".cast("double") / Dedup.K.toDouble, 4).as("est_jaccard"))
    }),

    // Approximate sketches — the 100 TB substitutes for q6's exact
    // distinct and q29's exact percentiles (HLL++ and KLL-style
    // mergeable state instead of per-key sets / full sorts). Sketch
    // internals are engine-specific, so the query emits ENGINE-
    // INDEPENDENT outputs: the exact counts (oracle-computable) plus
    // within-bound booleans for each sketch — HLL vs exact distinct
    // within 3×rsd, approx p50 between the exact p40/p60 (rank error
    // 1/accuracy ≪ 0.1). The exact sides exist to VALIDATE the sketch
    // (at 100 TB production uses the sketch alone); a sketch drifting
    // out of bounds flips a boolean and fails the hash gate.
    "q38_approx_sketches" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users_exact"),
          (abs(approx_count_distinct($"user_id", rsd = 0.02).cast("double")
              - countDistinct($"user_id").cast("double"))
            <= greatest(lit(1.0), countDistinct($"user_id") * lit(0.06)))
            .as("hll_ok"),
          expr("approx_percentile(value, 0.5, 1000)")
            .between(expr("percentile(value, 0.4)"),
              expr("percentile(value, 0.6)")).as("p50_ok"))
    }),
  )

  // ---- oracle SQL ------------------------------------------------------

  private val P = graft.ext.TextStats.P

  /** Sessions CTE chain shared by q30/q31 — mirrors Sessionize exactly:
    * gap compared on exact microsecond epochs (Spark `unix_micros`),
    * ties broken by event_id.
    */
  private val sessSql =
    s"""e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        s0 AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                    > ${SessionGap * 1000000L}
               THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s1 AS (SELECT user_id, ts,
          CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s0),
        sess AS (SELECT user_id, session_seq,
          min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events FROM s1 GROUP BY user_id, session_seq)"""

  private[queries] def dotSql(a: String, b: String) =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]))"

  private[queries] def cosSql(a: String, b: String) =
    Num.rSql(s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))", 6)

  /** The trained-IVF Lloyd unroll, shared VERBATIM by the q101, q106 and
    * q108 oracles so the trained index can never drift between the
    * single-query, batch-retrieval and semantic-dedup replays (the q107/
    * q105 shared-CTE discipline): one iteration from the first-16 seed,
    * assignment by rounded-cosine + centroid-id total order, per-(cell,
    * dim) mean rounded 1e-4 then cast float32 (q40's quantization —
    * bit-equal to Spark's rnd(avg)+toFloat), cells that lose every
    * member keep their seed centroid. Leaves `cent1` (trained centroids)
    * and `as1` (trained assignment: vec_id, embedding, cell) in scope.
    */
  private[queries] def lloydCte: String =
    s"""cents0 AS (SELECT vec_id AS cent_id, embedding AS cvec
            FROM embeddings WHERE vec_id < 16),
          a0 AS (SELECT e.vec_id, e.embedding, c.cent_id,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cent_id ASC) AS rn
            FROM embeddings e CROSS JOIN cents0 c),
          as0 AS (SELECT vec_id, embedding, cent_id AS cell FROM a0 WHERE rn = 1),
          upd AS (SELECT cell, i,
              CAST(floor(avg(embedding[i]) * 10000 + 0.5) / 10000 AS FLOAT) AS m
            FROM as0, (SELECT unnest(generate_series(1, 64)) AS i) g
            GROUP BY cell, i),
          cent1 AS (SELECT c0.cent_id, COALESCE(u.cvec, c0.cvec) AS cvec
            FROM cents0 c0 LEFT JOIN
              (SELECT cell, list(m ORDER BY i) AS cvec FROM upd GROUP BY cell) u
              ON u.cell = c0.cent_id),
          a1 AS (SELECT e.vec_id, e.embedding, c.cent_id,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cent_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent1 c),
          as1 AS (SELECT vec_id, embedding, cent_id AS cell FROM a1 WHERE rn = 1)"""

  private val toksExpr = "list_filter(string_split(text, ' '), t -> t != '')"
  private def codesExpr(toks: String) =
    s"""list_transform($toks, t -> list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
        (a, c) -> (a * 31 + c) % $P))"""

  /** 64 majority-vote CASE terms; bit 63's value must be written as an
    * arithmetic expression — the bare literal overflows DuckDB's BIGINT
    * parser into HUGEINT.
    */
  private val simhash64Terms: String = (0 until 64).map { k =>
    val a = 2L * k + 3
    val b = 7L * k + 1
    val bit = if (k == 63) "(-9223372036854775807 - 1)" else s"${1L << k}"
    s"""(CASE WHEN list_sum(list_transform(tset, c -> ((c * $a + $b) % $P) & 1)) * 2
         >= len(tset) THEN $bit ELSE CAST(0 AS BIGINT) END)"""
  }.mkString(" + ")

  /** The q108 semantic-dedup replay — the shared Lloyd unroll, then
    * pairs strictly inside a trained cell (the JOIN key IS the cell —
    * no cross-cell candidate can exist), the greedy keep-smallest-id
    * drop list, and the documents join. min(cell) is the constant cell
    * of vec2; count CAST to BIGINT for Spark's long count parity. ONE
    * string consumed by both the q108 (Scala) and q119 (SQL TVF) gates.
    */
  private[queries] val SemDedupOracle: String =
    s"""WITH $lloydCte,
        pairs AS (SELECT l.cell, l.vec_id AS vec1, r.vec_id AS vec2,
            ${cosSql("l.embedding", "r.embedding")} AS cos
          FROM as1 l JOIN as1 r ON l.cell = r.cell
          WHERE l.vec_id < r.vec_id),
        drops AS (SELECT vec2 AS doc_id, min(cell) AS cell,
            min(vec1) AS dup_of, max(cos) AS max_cos,
            CAST(count(*) AS BIGINT) AS n_dups
          FROM pairs WHERE cos >= 0.35 GROUP BY vec2)
        SELECT dr.doc_id, dr.cell, dr.dup_of, dr.max_cos, dr.n_dups,
          d.lang, d.n_chars
        FROM drops dr JOIN documents d ON dr.doc_id = d.doc_id"""

  val oracleSql: Map[String, String] = Map(
    "q27_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n_rows,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q28_pivot" -> {
      val cases = priorities.zipWithIndex.map { case (p, i) =>
        s"CAST(sum(CASE WHEN o_orderpriority = '$p' THEN cents END) AS BIGINT) AS p${i + 1}_cents"
      }.mkString(", ")
      s"""WITH t AS (SELECT o_orderstatus, o_orderpriority,
            CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
          SELECT o_orderstatus, $cases FROM t GROUP BY o_orderstatus"""
    },
    "q29_percentile" ->
      """SELECT l_returnflag,
           floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) / 10000 AS p50_qty,
           floor(quantile_cont(l_quantity, 0.95) * 10000 + 0.5) / 10000 AS p95_qty,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q30_sessionize" ->
      s"""WITH $sessSql SELECT user_id, session_seq, session_start,
            session_end, n_events FROM sess""",
    "q31_interval_join" ->
      s"""WITH $sessSql,
          u7 AS (SELECT session_seq,
            CAST(floor(epoch(session_start)) AS BIGINT) AS s,
            CAST(floor(epoch(session_end)) AS BIGINT) AS e
            FROM sess WHERE user_id = 7),
          pts AS (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec
            FROM events WHERE user_id != 7)
          SELECT session_seq, count(*) AS n_other_events
          FROM u7 JOIN pts ON pts.tsec BETWEEN u7.s AND u7.e
          GROUP BY session_seq""",
    // PQ + ADC replay: slice per subspace, argmin-L2 encode (the same
    // scaled-integer key as the engine — three dots composed then
    // floor(x*1e6+0.5), so the argmin and the sum can never straddle a
    // ULP), query table per (j, code), exact BIGINT sum of 4 lookups
    "q115_pq_adc" -> {
      def l2k(a: String, b: String) =
        s"""CAST(floor((${dotSql(a, a)} - 2.0 * ${dotSql(a, b)}
            + ${dotSql(b, b)}) * 1000000 + 0.5) AS BIGINT)"""
      s"""WITH js AS (SELECT unnest(generate_series(0, 3)) AS j),
          sub AS (SELECT e.vec_id, js.j,
              list_slice(e.embedding, js.j * 16 + 1, js.j * 16 + 16) AS sv
            FROM embeddings e, js),
          cbsub AS (SELECT c.vec_id AS code, js.j,
              list_slice(c.embedding, js.j * 16 + 1, js.j * 16 + 16) AS cv
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 16) c, js),
          enc AS (SELECT vec_id, j, code FROM (
              SELECT s.vec_id, s.j, c.code,
                row_number() OVER (PARTITION BY s.vec_id, s.j
                  ORDER BY ${l2k("s.sv", "c.cv")} ASC, c.code ASC) AS rn
              FROM sub s JOIN cbsub c ON s.j = c.j) t WHERE rn = 1),
          q AS (SELECT j, sv AS qv FROM sub WHERE vec_id = 0),
          tbl AS (SELECT c.j, c.code, ${l2k("q.qv", "c.cv")} AS d6
            FROM cbsub c JOIN q ON q.j = c.j)
          SELECT e.vec_id, CAST(sum(t.d6) AS BIGINT) AS pq_dist_s6
          FROM enc e JOIN tbl t ON e.j = t.j AND e.code = t.code
          WHERE e.vec_id != 0
          GROUP BY e.vec_id
          ORDER BY pq_dist_s6 ASC, vec_id ASC LIMIT 10"""
    },
    // the q32 probe/assignment chain + the q115 encode/ADC chain,
    // composed: candidates = probed cells only, codes/tables unchanged
    "q116_ivf_pq" -> {
      def l2k(a: String, b: String) =
        s"""CAST(floor((${dotSql(a, a)} - 2.0 * ${dotSql(a, b)}
            + ${dotSql(b, b)}) * 1000000 + 0.5) AS BIGINT)"""
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec
            FROM embeddings WHERE vec_id < 16),
          a AS (SELECT e.vec_id, e.embedding, c.cent_id,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cent_id ASC) AS rn
            FROM embeddings e CROSS JOIN cents c),
          assigned AS (SELECT vec_id, embedding, cent_id AS cell
            FROM a WHERE rn = 1),
          q0 AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
          probes AS (SELECT cent_id FROM cents, q0
            ORDER BY ${cosSql("cvec", "qvec")} DESC, cent_id ASC LIMIT 2),
          cand AS (SELECT vec_id, embedding FROM assigned
            JOIN probes ON assigned.cell = probes.cent_id),
          js AS (SELECT unnest(generate_series(0, 3)) AS j),
          sub AS (SELECT e.vec_id, js.j,
              list_slice(e.embedding, js.j * 16 + 1, js.j * 16 + 16) AS sv
            FROM cand e, js),
          cbsub AS (SELECT c.vec_id AS code, js.j,
              list_slice(c.embedding, js.j * 16 + 1, js.j * 16 + 16) AS cv
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 16) c, js),
          enc AS (SELECT vec_id, j, code FROM (
              SELECT s.vec_id, s.j, c.code,
                row_number() OVER (PARTITION BY s.vec_id, s.j
                  ORDER BY ${l2k("s.sv", "c.cv")} ASC, c.code ASC) AS rn
              FROM sub s JOIN cbsub c ON s.j = c.j) t WHERE rn = 1),
          qs AS (SELECT js.j,
              list_slice(q0.qvec, js.j * 16 + 1, js.j * 16 + 16) AS qv
            FROM q0, js),
          tbl AS (SELECT c.j, c.code, ${l2k("qs.qv", "c.cv")} AS d6
            FROM cbsub c JOIN qs ON qs.j = c.j)
          SELECT e.vec_id, CAST(sum(t.d6) AS BIGINT) AS pq_dist_s6
          FROM enc e JOIN tbl t ON e.j = t.j AND e.code = t.code
          WHERE e.vec_id != 0
          GROUP BY e.vec_id
          ORDER BY pq_dist_s6 ASC, vec_id ASC LIMIT 10"""
    },
    "q32_ivf_ann" ->
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec
            FROM embeddings WHERE vec_id < 16),
          a AS (SELECT e.vec_id, e.embedding, c.cent_id,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cent_id ASC) AS rn
            FROM embeddings e CROSS JOIN cents c),
          assigned AS (SELECT vec_id, embedding, cent_id AS cell FROM a WHERE rn = 1),
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
          probes AS (SELECT cent_id FROM cents, q
            ORDER BY ${cosSql("cvec", "qvec")} DESC, cent_id ASC LIMIT 2)
          SELECT vec_id, cell, ${cosSql("embedding", "qvec")} AS cos
          FROM assigned JOIN probes ON assigned.cell = probes.cent_id, q
          WHERE vec_id != 0
          ORDER BY cos DESC, vec_id ASC LIMIT 10""",
    // q32 with ONE unrolled Lloyd iteration: assign to the first-16
    // seed, per-(cell, dim) mean rounded 1e-4 then cast float32 (q40's
    // quantization — bit-equal to Spark's rnd(avg)+toFloat), cells that
    // lose every member keep their seed centroid, then the q32
    // probe/topk against the trained set. The unroll itself is
    // [[lloydCte]], shared verbatim with q106/q108.
    "q101_ivf_trained" ->
      s"""WITH $lloydCte,
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
          probes AS (SELECT cent_id FROM cent1, q
            ORDER BY ${cosSql("cvec", "qvec")} DESC, cent_id ASC LIMIT 2)
          SELECT vec_id, cell, ${cosSql("embedding", "qvec")} AS cos
          FROM as1 JOIN probes ON as1.cell = probes.cent_id, q
          WHERE vec_id != 0
          ORDER BY cos DESC, vec_id ASC LIMIT 10""",
    // q101's Lloyd unroll verbatim, then BATCH probes/rank: per-query
    // nprobe best centroids via a window over (query x cent1), the
    // probed-cell join, and row_number per query — mirroring
    // ivfBatchTopK's rounded-cosine + id total order at both stages.
    "q106_ivf_batch" ->
      s"""WITH $lloydCte,
          q AS (SELECT vec_id AS query_id, embedding AS qvec
            FROM embeddings WHERE vec_id < 5),
          pr AS (SELECT q.query_id, c.cent_id,
            row_number() OVER (PARTITION BY q.query_id
              ORDER BY ${cosSql("c.cvec", "q.qvec")} DESC, c.cent_id ASC) AS rn
            FROM cent1 c CROSS JOIN q),
          probes AS (SELECT query_id, cent_id FROM pr WHERE rn <= 2),
          cand AS (SELECT q.query_id, s.vec_id,
              ${cosSql("s.embedding", "q.qvec")} AS cos
            FROM as1 s
            JOIN probes p ON s.cell = p.cent_id
            JOIN q ON q.query_id = p.query_id
            WHERE s.vec_id != q.query_id),
          rk AS (SELECT query_id, vec_id, cos, row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
            FROM cand)
          SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
          FROM rk WHERE rank <= 10""",
    // the shared Lloyd unroll, then the semantic-dedup replay: pairs
    // strictly inside a trained cell (the JOIN key IS the cell — no
    // cross-cell candidate can exist), the greedy keep-smallest-id drop
    // list, and the documents join. min(cell) is the constant cell of
    // vec2; count CAST to BIGINT for Spark's long count parity.
    "q108_semantic_dedup" -> SemDedupOracle,
    // ONE oracle string, two consumers: the SQL table function must
    // land on the Scala gate's answer exactly (q111's discipline)
    "q119_semdedup_sql" -> SemDedupOracle,
    "q34_session_window" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         s0 AS (SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 3600000000
                THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s1 AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS seq FROM s0)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 3600 SECOND AS session_end,
           count(*) AS n_events
         FROM s1 GROUP BY user_id, seq""",
    "q46_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q47_string_agg" ->
      """SELECT l_returnflag,
           list_aggregate(list_sort(list_distinct(list(l_linestatus))), 'string_agg', ',')
             AS statuses
         FROM lineitem GROUP BY l_returnflag""",
    "q51_train_test_split" ->
      """WITH t AS (SELECT doc_id, (doc_id * 2654435761) % 100 AS bucket FROM documents)
         SELECT CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
           count(*) AS n_docs, min(doc_id) AS first_doc
         FROM t GROUP BY 1""",
    "q52_stratified_sample" ->
      """WITH t AS (SELECT lang, doc_id,
             (doc_id * 2654435761 + 97) % 1000 AS bucket FROM documents)
         SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
         FROM t
         WHERE (lang = 'en' AND bucket < 500) OR (lang = 'de' AND bucket < 200)
         GROUP BY lang""",
    "q60_reachability" ->
      """WITH RECURSIVE edges AS (
           SELECT DISTINCT user_id AS src,
             ((CAST(floor(value * 7) AS BIGINT) % 150) + 150) % 150 AS dst
           FROM events WHERE event_type = 'click'),
         r(node) AS (
           SELECT CAST(0 AS BIGINT)
           UNION
           SELECT e.dst FROM r JOIN edges e ON e.src = r.node)
         SELECT count(*) AS n_reachable, CAST(sum(node) AS BIGINT) AS node_sum
         FROM r""",
    "q59_array_funcs" ->
      """SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) / 1000000 AS first_val,
           floor(CAST(list_max(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS max_val,
           floor(CAST(list_min(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS min_val,
           floor(CAST(list_sort(embedding)[3] AS DOUBLE) * 1000000 + 0.5) / 1000000
             AS third_smallest,
           CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
           CAST(coalesce(nullif(label, 0), -1) AS BIGINT) AS label_or_neg1,
           CAST(greatest(label, 5) AS BIGINT) AS label_floor5
         FROM embeddings""",
    "q57_text_clean" ->
      """SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(text, '[0-9]+', '<NUM>', 'g'), ' +', ' ', 'g'))
             AS cleaned,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
             AS n_alpha
         FROM documents""",
    "q58_top_bigrams" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
           FROM documents),
         b AS (SELECT unnest(CASE WHEN len(toks) >= 2
           THEN list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END) AS bg FROM t)
         SELECT bg, count(*) AS n FROM b
         GROUP BY bg ORDER BY n DESC, bg ASC LIMIT 20""",
    "q55_llm_prep_pipeline" ->
      s"""WITH kept AS (SELECT doc_id, text, lang FROM (
            SELECT doc_id, text, lang,
              row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1),
          t AS (SELECT doc_id, lang,
            CAST(len($toksExpr) AS BIGINT) AS n_tokens FROM kept),
          f AS (SELECT * FROM t WHERE n_tokens >= 10),
          s AS (SELECT *, CASE WHEN (doc_id * 2654435761) % 100 < 90
            THEN 'train' ELSE 'eval' END AS split FROM f)
          SELECT split, lang, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM s GROUP BY 1, 2""",
    "q56_stats_family" ->
      """SELECT l_returnflag,
           floor(stddev_samp(l_quantity) * 10000 + 0.5) / 10000 AS sd_qty,
           floor(var_samp(l_quantity) * 10000 + 0.5) / 10000 AS var_qty,
           floor(corr(l_quantity, l_discount) * 1000000 + 0.5) / 1000000 AS corr_qd,
           floor(covar_samp(l_quantity, l_discount) * 1000000 + 0.5) / 1000000 AS cov_qd
         FROM lineitem GROUP BY l_returnflag""",
    "q53_datetime_funcs" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
         SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
           CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,
           CAST(EXTRACT(day FROM ts) AS BIGINT) AS dom,
           CAST(dayofweek(ts) AS BIGINT) AS dow_sun0,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
           strftime(ts, '%Y-%m') AS ym,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
             AS days_since
         FROM e""",
    "q54_string_funcs" ->
      """SELECT p_partkey,
           upper(p_name) AS uname,
           CAST(length(p_name) AS BIGINT) AS len,
           substring(p_name, 1, 5) AS head5,
           CAST(coalesce(strpos(p_name, 'o'), 0) AS BIGINT) AS first_o,
           translate(p_name, 'aeiou', 'AEIOU') AS voweled,
           list_reverse(string_split(p_name, ' '))[1] AS last_word,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key
         FROM part""",
    "q49_multiset_ops" ->
      """WITH a AS (SELECT l_suppkey AS k FROM lineitem),
              b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
         SELECT k, count(*) AS n
         FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
         GROUP BY k""",
    "q50_bool_aggs" ->
      """SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 400000.0) AS any_over_400k,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
         FROM orders GROUP BY o_orderpriority""",
    "q48_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
           CAST(floor(length(text) / 16) AS BIGINT) AS n_frames FROM documents),
         f AS (SELECT media_id, text, unnest(range(0, n_frames, 4)) AS frame_idx
           FROM m WHERE n_frames > 0)
         SELECT media_id, frame_idx,
           substring(text, CAST(frame_idx * 16 + 1 AS INTEGER), 16) AS frame_str
         FROM f""",
    "q45_data_audit" ->
      """SELECT
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS null_qty,
           (SELECT count(*) FROM lineitem
              WHERE l_quantity < 0 OR l_quantity > 50) AS range_violations,
           (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL) AS null_shipdate,
           (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS distinct_orders,
           (SELECT count(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
             AS orphan_lineitems""",
    "q44_corpus_minhash" -> {
      val mins = (0 until Dedup.K).map { i =>
        s"CAST(min((${Dedup.A(i)} * c + ${Dedup.B(i)}) % $P) AS BIGINT) AS m$i"
      }.mkString(", ")
      s"""WITH t AS (SELECT lang, unnest(${codesExpr(toksExpr)}) AS c FROM documents)
          SELECT lang, $mins FROM t GROUP BY lang"""
    },
    "q41_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec FROM events)
         SELECT event_id, user_id, ts,
           floor(avg(value) OVER (PARTITION BY user_id ORDER BY tsec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000
             AS avg_1h
         FROM e""",
    "q42_set_ops" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
              s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
         SELECT nationkey, 'both' AS set_op
           FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
         UNION ALL
         SELECT nationkey, 'cust_only'
           FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
         UNION ALL
         SELECT nationkey, 'supp_only'
           FROM (SELECT * FROM s EXCEPT SELECT * FROM c)""",
    "q43_fuzzy_match" ->
      """WITH d AS (SELECT DISTINCT p_name FROM part),
         p AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM d)
         SELECT l.p_name AS n1, r.p_name AS n2,
           CAST(levenshtein(l.p_name, r.p_name) AS BIGINT) AS dist
         FROM p l JOIN p r ON l.blk = r.blk AND l.p_name < r.p_name
         WHERE levenshtein(l.p_name, r.p_name) <= 3""",
    "q39_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
           count(*) AS n,
           floor(sum(value) * 10000 + 0.5) / 10000 AS sum_value
         FROM events GROUP BY 1""",
    "q40_vector_centroid" ->
      """SELECT label, i - 1 AS dim,
           floor(avg(embedding[i]) * 10000 + 0.5) / 10000 AS centroid_val
         FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
         GROUP BY 1, 2""",
    "q35_rank_windows" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank() OVER byqty AS BIGINT) AS rnk,
           CAST(dense_rank() OVER byqty AS BIGINT) AS drnk,
           floor(percent_rank() OVER byqty * 1000000 + 0.5) / 1000000 AS pr,
           floor(cume_dist() OVER byqty * 1000000 + 0.5) / 1000000 AS cd,
           CAST(ntile(4) OVER uniq AS INTEGER) AS nt
         FROM lineitem
         WINDOW byqty AS (PARTITION BY l_returnflag ORDER BY l_quantity),
                uniq AS (PARTITION BY l_returnflag
                         ORDER BY l_quantity, l_orderkey, l_linenumber)""",
    "q36_scalar_subquery" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
         SELECT o_orderkey, o_custkey, cents FROM o
         WHERE cents > (SELECT avg(cents) FROM o)""",
    "q37_gap_fill" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         obs AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           floor(sum(value) * 10000 + 0.5) / 10000 AS day_value
           FROM e GROUP BY 1, 2),
         b AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1),
         grid AS (SELECT user_id, CAST(unnest(generate_series(
           CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
           INTERVAL 1 DAY)) AS DATE) AS day FROM b),
         j AS (SELECT g.user_id, g.day, o.day_value
           FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day)
         SELECT user_id, day,
           last_value(day_value IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           day_value IS NOT NULL AS observed
         FROM j""",
    "q33_simhash64_pairs" ->
      s"""WITH c AS (SELECT doc_id, ${codesExpr(toksExpr)} AS codes FROM documents),
          t AS (SELECT doc_id, list_distinct(codes) AS tset FROM c
                WHERE len(list_distinct(codes)) > 0),
          s AS (SELECT doc_id, CAST($simhash64Terms AS BIGINT) AS sig FROM t)
          SELECT l.doc_id AS doc1, r.doc_id AS doc2,
            CAST(bit_count(xor(l.sig, r.sig)) AS BIGINT) AS hamming
          FROM s l JOIN s r ON l.doc_id < r.doc_id
          WHERE bit_count(xor(l.sig, r.sig)) <= 3""",
    "q74_corpus_overlap" -> {
      val mins = (0 until Dedup.K).map { i =>
        s"CAST(min((${Dedup.A(i)} * c + ${Dedup.B(i)}) % $P) AS BIGINT) AS m$i"
      }.mkString(", ")
      val agree = (0 until Dedup.K).map { i =>
        s"(CASE WHEN l.m$i = r.m$i THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH t AS (SELECT lang, unnest(${codesExpr(toksExpr)}) AS c FROM documents),
          sig AS (SELECT lang, $mins FROM t GROUP BY lang)
          SELECT lang1, lang2, n_agree,
            floor(CAST(n_agree AS DOUBLE) / ${Dedup.K} * 10000 + 0.5) / 10000
              AS est_jaccard
          FROM (SELECT l.lang AS lang1, r.lang AS lang2,
              CAST($agree AS BIGINT) AS n_agree
            FROM sig l JOIN sig r ON l.lang < r.lang)"""
    },
    // q38's sketch values are engine-specific; the ORACLE-ABLE contract
    // is the exact counts plus the sketches landing inside their error
    // bounds (the Spark side computes the booleans, the oracle asserts
    // they must all be TRUE).
    "q38_approx_sketches" ->
      """SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS hll_ok, TRUE AS p50_ok
         FROM events GROUP BY event_type""",
  )
}
