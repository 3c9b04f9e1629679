package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextStats}
import graft.queries.Num.{r => rnd}

/** Corpus mixing & monitoring operators (q88–q93) — the sampling-weight
  * and drift-tracking side of a training-data pipeline, beyond the
  * reference surface (north-star ops): temperature-based language
  * mixing, per-language token heavy hitters, near-dup cluster-size
  * profiling, shingle novelty, cross-snapshot KL drift, and output
  * shard balancing. Every query has a DuckDB oracle built from the SAME
  * constants; all cross-engine float arithmetic follows the established
  * rounding discipline (Num.r / integer-scaled logs summed exactly).
  */
object Mixing {
  type Q = (SparkSession, String) => DataFrame

  private val P = TextStats.P

  /** Temperature exponent for q88's language rebalancing (the standard
    * multilingual alpha-sampling move: w_l ∝ p_l^α flattens the natural
    * distribution toward uniform as α → 0).
    */
  private val Alpha = 0.3
  private val EpochDocs = 10000L

  val queries: Map[String, Q] = Map(
    // Temperature (alpha) sampling weights per language: p^α,
    // normalized, plus the expected docs drawn per 10k-doc epoch.
    // Shape: one count aggregate (languages-sized), all arithmetic on
    // the tiny agg table — window over a handful of rows, never the
    // corpus. Determinism: p rounded at 1e-6, p^α scaled to an exact
    // long at 1e-6 (q84's integer trick) so the normalizing sum is
    // exact-integer on both engines; only pow itself relies on libm
    // agreement, confined by the rounding like q71's idf.
    "q88_temperature_sampling" -> ((s, d) => {
      import s.implicits._
      // scalar totals via crossJoin(broadcast(agg)) — the q92 form —
      // instead of an unpartitioned window: same cost on this K-row
      // frame, but keeps plan audits free of WindowExec warnings that
      // WOULD be real on an unaggregated input. cnts is cached (K rows)
      // so its two consumers don't re-scan the corpus.
      val cnts = Dedup.cached(Tables.documents(s, d).groupBy($"lang")
        .agg(count(lit(1)).as("n_docs")))
      val tot = cnts.agg(sum($"n_docs").as("total"))
      val p = Dedup.cached(cnts.crossJoin(broadcast(tot))
        .withColumn("p_r",
          rnd($"n_docs".cast("double") / $"total".cast("double"), 6))
        .withColumn("pw6",
          floor(pow($"p_r", lit(Alpha)) * 1000000 + 0.5).cast("long")))
      val z = p.agg(sum($"pw6").as("z6"))
      p.crossJoin(broadcast(z))
        .select($"lang", $"n_docs", $"p_r",
          rnd($"pw6".cast("double") / $"z6".cast("double"), 6).as("weight"),
          floor(lit(EpochDocs).cast("double") * $"pw6".cast("double") /
            $"z6".cast("double") + 0.5).cast("long").as("epoch_docs"))
    }),

    // Per-language token heavy hitters (top-5 by count, code tiebreak)
    // via the mergeable bounded top-k aggregator — L × k tuples per
    // partition, never a window over the (lang, code) count table. The
    // aggregator carries (cnt, code) as native longs with an exact
    // (cnt desc, code asc) 64-bit comparison — no double packing, so
    // the ordering and the recovered count stay exact for ANY count
    // (the earlier cnt·2³¹ − code double was only exact below
    // cnt < 2²², which a hot token in a large corpus exceeds).
    "q89_lang_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val cnts = Tables.documents(s, d)
        .select($"lang",
          explode_outer(TextStats.tokenCodesOf($"text")).as("code"))
        .filter($"code".isNotNull)
        .groupBy($"lang", $"code").agg(count(lit(1)).as("cnt"))
      val topk = udaf(new graft.ext.TopKByLong(5))
      cnts.groupBy($"lang")
        .agg(topk($"cnt", $"code").as("top"))
        .select($"lang", posexplode($"top").as(Seq("rank0", "r")))
        .select($"lang", ($"rank0" + 1).cast("long").as("rank"),
          $"r._2".as("code"), $"r._1".as("cnt"))
    }),

    // Near-dup cluster-size histogram: the dedup QA artifact (how much
    // of the corpus sits in 2-doc pairs vs giant boilerplate blobs).
    // Same LSH pairs + components as q65 — one more count-sized
    // aggregation, zero new wide shuffles.
    "q90_cluster_size_histogram" -> ((s, d) => {
      import s.implicits._
      val pairs = Dedup.minhashPairs(Tables.documents(s, d), minJaccard = 0.7)
        .select($"doc1".as("src"), $"doc2".as("dst"))
      graft.operators.Graph.connectedComponents(s, pairs)
        .groupBy($"component").agg(count(lit(1)).as("sz"))
        .groupBy($"sz").agg(count(lit(1)).as("n_clusters"))
        .select($"sz".as("cluster_size"), $"n_clusters",
          ($"sz" * $"n_clusters").as("n_docs_total"))
    }),

    // Shingle novelty: fraction of a doc's distinct 5-gram shingles
    // appearing in NO other document — high novelty = fresh content,
    // low = boilerplate/templated. Shape: ids + 64-bit codes through
    // both shuffles (doc-frequency count, then join back) on the
    // uniformly-hashed code; the shingle table is cached because its
    // two consumers shuffle it on the same key but separate scans would
    // re-run the shingle kernel (released via clearSignatureCaches).
    "q91_shingle_novelty" -> ((s, d) => {
      import s.implicits._
      val pos = Dedup.cached(
        Dedup.shingleSets(Tables.documents(s, d))
          .select($"doc_id", explode($"tset").as("code")))
      val df = pos.groupBy($"code").agg(count(lit(1)).as("df"))
      pos.join(df, Seq("code"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"df" === 1, 1L).otherwise(0L)).as("n_novel"))
        .select($"doc_id", $"n_shingles", $"n_novel",
          rnd($"n_novel".cast("double") / $"n_shingles".cast("double"), 4)
            .as("novelty"))
    }),

    // Token-distribution KL drift between two corpus halves (doc_id
    // parity plays "last month vs this month"): KL(A ‖ B) with add-one
    // smoothing on the B side so A-only tokens stay finite. The
    // dashboard number a 100 TB ingest monitors for domain shift.
    // Shape: two map-side-combined count aggregates, one full-outer
    // join on the uniform code key, scalars broadcast; per-term logs
    // rounded to integer 1e-4 units and summed EXACTLY as longs (the
    // q83/q85 discipline) so the only libm exposure is ln itself.
    "q92_token_kl_drift" -> ((s, d) => {
      import s.implicits._
      // ONE conditional aggregate instead of two filtered count tables
      // + a full-outer join: halves the corpus scans and drops the join
      // entirely (plan-audited — the join form read documents twice).
      // Cached (vocab-sized) because both the scalar totals and the
      // term aggregation consume it — uncached, each re-scans the
      // corpus.
      val j = Dedup.cached(Tables.documents(s, d)
        .select($"doc_id",
          explode_outer(TextStats.tokenCodesOf($"text")).as("code"))
        .filter($"code".isNotNull)
        .groupBy($"code")
        .agg(
          sum(when(pmod($"doc_id", lit(2L)) === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(pmod($"doc_id", lit(2L)) === 1, 1L).otherwise(0L)).as("cb")))
      val tot = j.agg(sum($"ca").as("na"), sum($"cb").as("nb"),
        count(lit(1)).as("v"))
      // UNGROUPED final aggregate, scalars re-attached after: exactly
      // one output row even when no code has ca > 0 (half A empty),
      // where a groupBy over the filtered-empty set would return zero
      // rows but the oracle's ungrouped sum returns one NULL row — the
      // degenerate corpus must agree on BOTH engines.
      val s4 = j.crossJoin(broadcast(tot))
        .filter($"ca" > 0)
        .select(($"ca" * floor(log(
            ($"ca".cast("double") / $"na".cast("double")) /
              (($"cb" + 1).cast("double") / ($"nb" + $"v").cast("double")))
            * 10000 + 0.5).cast("long")).as("term"))
        .agg(sum($"term").as("s4"))
      s4.crossJoin(broadcast(tot))
        .select($"na".as("n_tokens_a"), $"nb".as("n_tokens_b"),
          $"v".as("n_codes"),
          rnd($"s4".cast("double") / ($"na".cast("double") * 10000.0), 6)
            .as("kl_ab"))
    }),

    // Directed containment dedup: subset/quote-expansion pairs that
    // symmetric Jaccard misses (a doc pasted inside a longer one scores
    // containment 1.0 but Jaccard |A|/|B|). Same capped LSH candidate
    // stage as q21; only the verify metric differs. See
    // Dedup.containmentPairs for the recall caveat on extreme
    // size asymmetry.
    "q94_containment_dedup" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), minContainment = 0.8)),

    // Per-language token-length quantiles (p25/p50/p75/p95), EXACT —
    // computed the scale-honest way: a (lang, n_tok) value HISTOGRAM
    // (token counts are a bounded domain, so the histogram is tiny no
    // matter the corpus size) + linear interpolation at rank
    // h = q·(n−1), instead of Spark's exact `percentile` aggregate
    // which buffers every group value in one task. Matches DuckDB's
    // quantile_cont definition term for term: lower + (upper−lower)·frac
    // on the same doubles, so the oracle is the built-in.
    "q95_length_quantiles" -> ((s, d) => {
      import s.implicits._
      // cached: the histogram feeds BOTH the cum window and the n-per-
      // lang totals on different keys, so exchange reuse can't kick in;
      // uncached, each consumer re-scans the corpus (plan-audited)
      val hist = Dedup.cached(Tables.documents(s, d)
        .select($"lang",
          coalesce(size(TextStats.tokens($"text")), lit(0))
            .cast("long").as("v"))
        .groupBy($"lang", $"v").agg(count(lit(1)).as("cnt")))
      val wCum = Window.partitionBy($"lang").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum($"cnt").over(wCum))
      val n = hist.groupBy($"lang").agg(sum($"cnt").as("n"))
      val qs = Seq(0.25, 0.50, 0.75, 0.95).toDF("q")
      // 4 rank requests per language; histogram × 4 join stays
      // histogram-sized (the histogram is the small side by domain)
      val ranks = n.crossJoin(qs)
        .withColumn("h", $"q" * ($"n" - 1).cast("double"))
        .withColumn("lo", floor($"h").cast("long"))
        .withColumn("frac", $"h" - $"lo".cast("double"))
      // null-safe on lang: a NULL-lang group survives groupBy on both
      // engines, and the oracle's GROUP BY emits its quantile row — a
      // plain equi-join would silently drop it here (NULL != NULL)
      ranks.join(cum, ranks("lang") <=> cum("lang"))
        .drop(cum("lang"))
        .groupBy($"lang", $"q", $"lo", $"frac")
        .agg(
          min(when($"cum" >= $"lo" + 1, $"v")).as("vlo"),
          min(when($"cum" >= $"lo" + 2, $"v")).as("vhi"))
        .select($"lang", $"q",
          rnd($"vlo".cast("double") +
            (coalesce($"vhi", $"vlo") - $"vlo").cast("double") * $"frac", 6)
            .as("quantile"))
    }),

    // Exact-k per-stratum sample: EXACTLY min(k, n) docs per language,
    // chosen deterministically by injective-hash order (q87's hash,
    // doc_id tiebreak) — the "give me 25 docs per language" primitive.
    // Shape: the mergeable TopKByLong carries L × k (hash, id) pairs
    // per partition through ONE shuffle; the window-row_number
    // formulation would shuffle and rank EVERY row. q52's permille
    // threshold gives a binomial-sized sample; this one is exact-count.
    "q97_exact_k_sample" -> ((s, d) => {
      import s.implicits._
      val topk = udaf(new graft.ext.TopKByLong(25))
      Tables.documents(s, d)
        .select($"lang", $"doc_id",
          pmod($"doc_id" * 2654435761L + 17L, lit(1000000007L)).as("h"))
        .groupBy($"lang")
        // score = -h: top-k by score desc == the k SMALLEST hashes,
        // ties on doc_id asc — exact long compares, any corpus size
        .agg(topk(-$"h", $"doc_id").as("top"))
        .select($"lang", posexplode($"top").as(Seq("rank0", "r")))
        .select($"lang", ($"rank0" + 1).cast("long").as("rank"),
          $"r._2".as("doc_id"))
    }),

    // Output shard balance: docs hashed into 16 training shards (same
    // injective multiplicative hash as q87's sampling order), with
    // per-shard doc and token totals — the pre-write check that no
    // shard is hot before a 100 TB materialization. Pure map + one
    // 16-group aggregate.
    "q93_shard_balance" -> ((s, d) => {
      import s.implicits._
      // shard hash SHARED BY REFERENCE with jobs.JsonlExport.shardOf —
      // this balance check is the export writer's pre-write prediction,
      // which only holds if one definition feeds both
      Tables.documents(s, d)
        .select(graft.jobs.JsonlExport.shardOf($"doc_id", 16).as("shard"),
          coalesce(size(TextStats.tokens($"text")), lit(0))
            .cast("long").as("n_tok"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
    }),

    // Training-sequence packing plan (GPT-style contiguous token
    // stream, 2048-token sequences): per document, the global stream
    // offset and the sequence indices it lands in. The running token
    // sum is the two-phase distributed prefix scan, never an
    // un-partitioned window — see graft.ext.Packing.
    "q112_sequence_pack" -> ((s, d) =>
      graft.ext.Packing.packPlan(Tables.documents(s, d), seqLen = 2048L)),

    // The packing manifest (q112's inverse): per training sequence, the
    // contributing docs and clipped token counts — every sequence holds
    // exactly 2048 tokens except the last (the data-loader contract).
    "q114_pack_manifest" -> ((s, d) =>
      graft.ext.Packing.sequenceManifest(Tables.documents(s, d),
        seqLen = 2048L)),

    // PPS systematic sampling (probability-proportional-to-size): per
    // language, lay the docs on a token-weighted line in q87's
    // deterministic hash order and select every doc whose interval
    // contains a multiple of step = total_tokens DIV 25 — the standard
    // survey-sampling / corpus-selection move (big docs proportionally
    // likelier, tiny docs still reachable), here EXACT-INTEGER end to
    // end: no ln/exp keys, so cross-engine parity needs no rounding
    // discipline at all. `picks` counts the multiples inside the
    // interval (a doc larger than step is selected once with
    // multiplicity, preserving Σpicks = tw DIV step ≈ 25 per lang).
    // Scale: the weighted line is the same two-phase PrefixSum as
    // q87/q112; totals are count-sized and broadcast back.
    "q113_pps_sample" -> ((s, d) => {
      import s.implicits._
      // doc_id reduced mod p BEFORE the multiply: (doc_id % p) < 1e9 so
      // the product stays < 2.7e18 — no ANSI overflow even at 100 TB id
      // ranges (doc_id alone would overflow past ~3.5e9). doc_id rides
      // as an order tiebreak so an h-collision can't make the running
      // sum order-nondeterministic (unique order also makes the
      // oracle's default RANGE frame equal ROWS).
      val base = Tables.documents(s, d).select(
        $"lang",
        pmod(pmod($"doc_id", lit(1000000007L)) * 2654435761L + 17L,
          lit(1000000007L)).as("h"),
        $"doc_id",
        coalesce(size(TextStats.tokens($"text")), lit(0))
          .cast("long").as("n_tok"))
      val cum = graft.operators.PrefixSum
        .cumSumByKey(base, "lang", Seq("h", "doc_id"), "n_tok")
      val tot = cum.groupBy($"lang").agg(sum($"n_tok").as("tw"))
        .withColumn("step", greatest(expr("tw DIV 25"), lit(1L)))
        .select($"lang", $"step")
      cum.join(broadcast(tot), Seq("lang"))
        .filter($"n_tok" > 0)
        .withColumn("start", $"cum" - $"n_tok")
        // multiples of step in [start, start+n_tok-1]; the start=0 case
        // guards the negative dividend where Spark DIV truncates toward
        // zero but SQL // floors — all other operands are non-negative
        .withColumn("picks",
          expr("(start + n_tok - 1) DIV step") -
            when($"start" === 0L, lit(0L))
              .otherwise(expr("(start - 1) DIV step")))
        .filter($"picks" > 0)
        .select($"lang", $"doc_id", $"n_tok", $"picks")
    }),
  )

  // ---- oracle SQL ------------------------------------------------------

  import LlmQueries.{toksExpr, codesExpr, shingleCtes, minhashCols, bandKeyCase}

  val oracleSql: Map[String, String] = Map(
    // the oracle may use the naive un-partitioned window the Spark side
    // deliberately avoids — doc_id is unique, so the default RANGE
    // frame equals ROWS and the running sum is well-defined; every
    // dividend is non-negative so // and % agree with DIV and pmod
    "q112_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(coalesce(len($toksExpr), 0) AS BIGINT) AS n_tok
            FROM documents),
          c AS (SELECT doc_id, n_tok,
            CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT)
              AS start_tok FROM t)
          SELECT doc_id, n_tok, start_tok,
            CAST(start_tok // 2048 AS BIGINT) AS start_seq,
            CAST(start_tok % 2048 AS BIGINT) AS start_off,
            CAST((start_tok + n_tok - 1) // 2048 AS BIGINT) AS end_seq,
            CAST((start_tok + n_tok - 1) // 2048 - start_tok // 2048 + 1
              AS BIGINT) AS n_seqs
          FROM c WHERE n_tok > 0""",
    // the q112 chain + generate_series over each doc's sequence span +
    // interval clipping with greatest/least — all integer arithmetic
    "q114_pack_manifest" ->
      s"""WITH t AS (SELECT doc_id,
            CAST(coalesce(len($toksExpr), 0) AS BIGINT) AS n_tok
            FROM documents),
          c AS (SELECT doc_id, n_tok,
            CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT)
              AS start_tok FROM t),
          p AS (SELECT doc_id, n_tok, start_tok,
              start_tok + n_tok AS end_tok,
              start_tok // 2048 AS start_seq,
              (start_tok + n_tok - 1) // 2048 AS end_seq
            FROM c WHERE n_tok > 0),
          e AS (SELECT doc_id, n_tok, start_tok, end_tok,
              unnest(generate_series(start_seq, end_seq)) AS seq_id
            FROM p)
          SELECT seq_id, count(*) AS n_docs,
            CAST(sum(least(end_tok, (seq_id + 1) * 2048) -
              greatest(start_tok, seq_id * 2048)) AS BIGINT) AS n_tok,
            min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM e GROUP BY seq_id""",
    // exact-integer PPS: q87's hash order + token-weighted line; the
    // CASE start = 0 mirror matters — (start-1)//step would floor a
    // negative dividend where Spark DIV truncates. doc_id is reduced
    // mod p before the multiply (overflow headroom, mirrors Spark) and
    // rides as the ORDER BY tiebreak (unique order ⇒ RANGE == ROWS).
    "q113_pps_sample" ->
      s"""WITH t AS (SELECT lang, doc_id,
            ((doc_id % 1000000007) * 2654435761 + 17) % 1000000007 AS h,
            CAST(coalesce(len($toksExpr), 0) AS BIGINT) AS n_tok
            FROM documents),
          c AS (SELECT *, CAST(sum(n_tok) OVER (
              PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS cum FROM t),
          w AS (SELECT lang, greatest(CAST(sum(n_tok) AS BIGINT) // 25, 1)
              AS step FROM t GROUP BY lang),
          j AS (SELECT c.lang, c.doc_id, c.n_tok,
              c.cum - c.n_tok AS start, w.step
            FROM c JOIN w USING (lang) WHERE c.n_tok > 0),
          p AS (SELECT lang, doc_id, n_tok,
              CAST((start + n_tok - 1) // step -
                CASE WHEN start = 0 THEN 0 ELSE (start - 1) // step END
                AS BIGINT) AS picks
            FROM j)
          SELECT lang, doc_id, n_tok, picks FROM p WHERE picks > 0""",
    "q88_temperature_sampling" ->
      s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
          t AS (SELECT lang, n_docs, (SELECT sum(n_docs) FROM c) AS total FROM c),
          p AS (SELECT lang, n_docs,
              ${Num.rSql("CAST(n_docs AS DOUBLE) / total", 6)} AS p_r FROM t),
          w AS (SELECT lang, n_docs, p_r,
              CAST(floor(pow(p_r, $Alpha) * 1000000 + 0.5) AS BIGINT) AS pw6
            FROM p),
          z AS (SELECT *, (SELECT sum(pw6) FROM w) AS z6 FROM w)
          SELECT lang, n_docs, p_r,
            ${Num.rSql("CAST(pw6 AS DOUBLE) / z6", 6)} AS weight,
            CAST(floor($EpochDocs * CAST(pw6 AS DOUBLE) / z6 + 0.5) AS BIGINT)
              AS epoch_docs
          FROM z""",
    "q89_lang_heavy_hitters" ->
      s"""WITH c AS (SELECT lang, ${codesExpr(toksExpr)} AS codes FROM documents),
          e AS (SELECT lang, unnest(codes) AS code FROM c),
          g AS (SELECT lang, code, count(*) AS cnt FROM e GROUP BY lang, code),
          r AS (SELECT lang, code, cnt, row_number() OVER (
              PARTITION BY lang ORDER BY cnt DESC, code) AS rank FROM g)
          SELECT lang, CAST(rank AS BIGINT) AS rank, code, cnt
          FROM r WHERE rank <= 5""",
    "q90_cluster_size_histogram" -> {
      val q65 = LlmQueries.oracleSql("q65_dedup_components")
      s"""SELECT sz AS cluster_size, count(*) AS n_clusters,
            CAST(sz * count(*) AS BIGINT) AS n_docs_total
          FROM (SELECT n_docs AS sz FROM ($q65) q65)
          GROUP BY sz"""
    },
    "q91_shingle_novelty" ->
      s"""SELECT * FROM (WITH $shingleCtes,
          pos AS (SELECT doc_id, unnest(tset) AS code FROM t
                  WHERE len(tset) > 0),
          d AS (SELECT code, count(*) AS df FROM pos GROUP BY code),
          a AS (SELECT doc_id, count(*) AS n_shingles,
              CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_novel
            FROM pos JOIN d USING (code) GROUP BY doc_id)
          SELECT doc_id, n_shingles, n_novel,
            ${Num.rSql("CAST(n_novel AS DOUBLE) / n_shingles", 4)} AS novelty
          FROM a)""",
    "q92_token_kl_drift" ->
      s"""WITH c AS (SELECT doc_id, ${codesExpr(toksExpr)} AS codes FROM documents),
          e AS (SELECT doc_id, unnest(codes) AS code FROM c),
          a AS (SELECT code, count(*) AS ca FROM e WHERE doc_id % 2 = 0
                GROUP BY code),
          b AS (SELECT code, count(*) AS cb FROM e WHERE doc_id % 2 = 1
                GROUP BY code),
          j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
                FROM a FULL OUTER JOIN b ON a.code = b.code),
          t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              CAST(sum(cb) AS BIGINT) AS nb, count(*) AS v FROM j),
          s AS (SELECT CAST(sum(ca * CAST(floor(ln(
                (CAST(ca AS DOUBLE) / na) /
                (CAST(cb + 1 AS DOUBLE) / (nb + v))) * 10000 + 0.5)
              AS BIGINT)) AS BIGINT) AS s4
            FROM j, t WHERE ca > 0)
          SELECT t.na AS n_tokens_a, t.nb AS n_tokens_b,
            CAST(t.v AS BIGINT) AS n_codes,
            ${Num.rSql("CAST(s.s4 AS DOUBLE) / (t.na * 10000.0)", 6)} AS kl_ab
          FROM s, t""",
    "q95_length_quantiles" -> {
      // quantile_cont demands a CONSTANT quantile — one UNION ALL arm
      // per requested q
      val arms = Seq(0.25, 0.50, 0.75, 0.95).map { q =>
        s"""SELECT lang, CAST($q AS DOUBLE) AS q,
            ${Num.rSql(s"quantile_cont(v, $q)", 6)} AS quantile
            FROM t GROUP BY lang"""
      }.mkString("\n          UNION ALL\n          ")
      s"""WITH t AS (SELECT lang,
            CAST(coalesce(len($toksExpr), 0) AS BIGINT) AS v FROM documents)
          $arms"""
    },
    "q94_containment_dedup" ->
      s"""SELECT * FROM (WITH $shingleCtes,
          sig AS (SELECT doc_id, tset, $minhashCols FROM t),
          bands0 AS (
            SELECT doc_id, tset, band, $bandKeyCase AS key
            FROM sig CROSS JOIN (VALUES ${(0 until Dedup.Bands).map(b => s"($b)").mkString(", ")}) AS bb(band)
            WHERE len(tset) > 0),
          bands AS (
            SELECT doc_id, tset, band, key FROM (
              SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz FROM bands0)
            WHERE bsz <= 1000),
          cand AS (
            SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2,
              l.tset AS t1, r.tset AS t2
            FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
            WHERE l.doc_id < r.doc_id)
          SELECT
            CASE WHEN len(t1) < len(t2) OR (len(t1) = len(t2) AND doc1 < doc2)
                 THEN doc1 ELSE doc2 END AS inner_doc,
            CASE WHEN len(t1) < len(t2) OR (len(t1) = len(t2) AND doc1 < doc2)
                 THEN doc2 ELSE doc1 END AS outer_doc,
            ${Num.rSql(
              "CAST(len(list_intersect(t1, t2)) AS DOUBLE) / least(len(t1), len(t2))",
              4)} AS containment
          FROM cand) WHERE containment >= 0.8""",
    "q97_exact_k_sample" ->
      """WITH t AS (SELECT lang, doc_id,
            (doc_id * 2654435761 + 17) % 1000000007 AS h FROM documents),
          r AS (SELECT lang, doc_id, row_number() OVER (
              PARTITION BY lang ORDER BY h, doc_id) AS rank FROM t)
          SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
          FROM r WHERE rank <= 25""",
    // DuckDB's % is sign-following while Spark's pmod is non-negative:
    // the two agree only for non-negative dividends. doc_id >= 0 by the
    // corpus contract, and every later dividend is non-negative given a
    // non-negative inner term, so sign-safe-wrapping the INNER mod makes
    // the whole chain id-sign-proof (r9 advice).
    "q93_shard_balance" ->
      s"""WITH t AS (SELECT
            ((((doc_id % ${graft.jobs.JsonlExport.Mod}
                + ${graft.jobs.JsonlExport.Mod}) % ${graft.jobs.JsonlExport.Mod})
              * ${graft.jobs.JsonlExport.Mult}
              + ${graft.jobs.JsonlExport.Salt})
              % ${graft.jobs.JsonlExport.Mod}) % 16 AS shard,
            coalesce(len($toksExpr), 0) AS n_tok FROM documents)
          SELECT shard, count(*) AS n_docs,
            CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM t GROUP BY shard""",
  )
}
