package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-path scale probe (SCALE.md): replicate the documents table
  * K× and time the pair-generator queries at each multiplier, proving
  * the `maxBucket` guards and ids-only candidate shuffles hold the
  * growth near-linear.
  *
  * Replication puts each replica's tokens in a PRIVATE namespace
  * (`r<k>_` prefix) so replicas are mutually shingle-disjoint: K× data
  * is K independent copies of the same near-dup problem — runtime
  * should scale ~K while output row counts scale exactly K. Verbatim
  * duplication would instead make every doc an exact dup of its K-1
  * replicas and grow the TRUE pair count quadratically in K, measuring
  * output explosion rather than engine scaling.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [multipliers, default 1,2,5,10]
  *        [comma-separated query names, default the four pair generators]
  * Prints one JSON line per (query, multiplier) and a summary table.
  */
object ScaleProbe {

  private val DefaultQueries = Seq("q21_minhash_pairs", "q22_bigram_jaccard",
    "q33_simhash64_pairs", "q65_dedup_components")

  /** Every temp dir the probe creates (scaled corpora + export output)
    * is registered here and removed at the end of main — repeated probe
    * runs previously accumulated full corpus copies under /tmp.
    */
  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def tempDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    tempDirs += d
    d
  }

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(c => deleteRecursively(c.getAbsolutePath))
    f.delete()
  }

  /** Probe-only variants beyond SparkEntry: `q65_tier2_forced` runs the
    * q65 pair set through connectedComponents with `driverEdgeLimit = 0`,
    * forcing the distributed min-label tier on a graph that would
    * normally ride tier-0 union-find — the only way to put a measured
    * number on the tier-2 path before a corpus big enough to engage it
    * naturally (>500k edges) exists.
    */
  private val ExtraProbes: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Materialization throughput: JsonlExport the (scaled) documents
    // table into 16 shards and return the read-back line frame, so the
    // counted rows double as the exported-line self-check. The timing
    // covers serialize + shuffle + sort + write + re-read.
    "export_jsonl" -> ((s: SparkSession, d: String) => {
      val out = tempDir("export_probe")
      graft.jobs.JsonlExport.export(Tables.documents(s, d), "doc_id",
        out, nShards = 16)
      s.read.text(s"$out/shard=*/")
    }),
    // Batch BM25 with queries drawn FROM the (scaled) corpus: the q102
    // probe's fixed terms provably never match replica-namespaced
    // tokens, so it only ever exercised the corpus-side term — here
    // each replica contributes 4 queries built from its own first
    // tokens, so the match table is non-empty at every multiplier and
    // the match-side cost (tf shuffle, query fan-out, per-query top-k)
    // finally scales with the corpus.
    "q105_bm25_batch" -> ((s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") % lit(1000000L) < 4)
        .select(col("doc_id").as("query_id"),
          slice(graft.ext.TextStats.tokens(coalesce(col("text"), lit(""))),
            1, 3).as("terms"))
      graft.ext.Retrieval.bm25BatchTopK(docs, queries, 10)
    }),
    // Pure distributed star (endgame tier disabled) on the REAL dedup
    // pair graph: guards the q100 trim against "the driver-finish hid
    // the star loop's cost" — this is the path a >finishEdgeLimit graph
    // takes, measured on the near-clique shape at corpus scale.
    "q100_star_forced" -> ((s: SparkSession, d: String) => {
      val pairs = graft.ext.Dedup
        .minhashPairs(Tables.documents(s, d), minJaccard = 0.7)
        .select(col("doc1").as("src"), col("doc2").as("dst"))
      graft.operators.Graph.connectedComponentsStar(s, pairs,
        finishEdgeLimit = 0L)
        .groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
    }),
    // Semantic dedup under the PRODUCTION k rule: k = corpus/targetCell
    // (cells stay ~125 vectors however big the corpus gets — SemDeDup's
    // own practice), seeds hash-spread across the WHOLE corpus (the
    // gated q108's first-16-ids seeding would only ever pick replica-0
    // vectors here). The curve this exists to draw: scored pair count
    // tracks intra-cell density (≈ n × cellSize / 2, LINEAR in corpus),
    // never corpus² — k growing with n is what makes SemDeDup viable at
    // 100 TB, and this probe is that rule as executed code.
    "q108_semdedup_scaled" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val targetCell = 125L
      val k = math.max(16L, emb.count() / targetCell).toInt
      val seeds = emb.select(col("vec_id"), col("embedding"))
        .withColumn("h",
          pmod(pmod(col("vec_id"), lit(1000000007L)) * 2654435761L + 13L,
            lit(1000000007L)))
        .orderBy(col("h"), col("vec_id")).limit(k)
        .collect().map(r => r.getSeq[Float](1))
      val cents = seeds.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      graft.ext.Dedup.semanticDropList(emb, Tables.documents(s, d), cents,
        minCos = 0.35)
    }),
    // The q122 ingest under the PRODUCTION semantic-index rule (the
    // q108_semdedup_scaled seeding: k = corpus/targetCell, hash-spread
    // seeds). The gated q122 pins the fixed q101-trained k=16 index so
    // DuckDB can replay training — but across scaled replicas that
    // seeding is a probe artifact (replica-0-only seeds pile rotated
    // replicas into one cell and the accepted count stops being
    // comparable across multipliers). This probe measures the shape
    // that runs at 100 TB.
    "q122_incremental_scaled" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val targetCell = 125L
      val k = math.max(16L, emb.count() / targetCell).toInt
      val seeds = emb.select(col("vec_id"), col("embedding"))
        .withColumn("h",
          pmod(pmod(col("vec_id"), lit(1000000007L)) * 2654435761L + 13L,
            lit(1000000007L)))
        .orderBy(col("h"), col("vec_id")).limit(k)
        .collect().map(r => r.getSeq[Float](1))
      val cents = seeds.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      graft.queries.Curation.incrementalIngest(s, Tables.documents(s, d),
        emb, pmod(col("doc_id"), lit(7L)) === 0L, Some(cents))
    }),
    "q65_tier2_forced" -> ((s: SparkSession, d: String) => {
      val pairs = graft.ext.Dedup
        .minhashPairs(Tables.documents(s, d), minJaccard = 0.7)
        .select(col("doc1").as("src"), col("doc2").as("dst"))
      // fallbackToStar = false: this probe MEASURES the min-label tier;
      // silently timing the star path on non-convergence would corrupt
      // the SCALE.md tier-2 series — fail loudly instead
      graft.operators.Graph.connectedComponents(s, pairs, driverEdgeLimit = 0L,
        verbose = sys.env.contains("SPARK_GRAFT_CC_VERBOSE"),
        fallbackToStar = false)
    })
  )

  /** `alphaNs`: replica namespace prefixes WITHOUT digits ("ra_", "rb_"
    * …) — required by the curation-pipeline probes, whose stage-1 clean
    * rewrites `[0-9]+` → `<NUM>` and would otherwise collapse `r0_`/
    * `r1_` into ONE token, silently destroying replica independence
    * (observed: replica-1's store chain shrank 6× at the exact-dedup
    * stage because its cleaned texts equalled replica-0's). The digit
    * form stays the default so every previously recorded probe corpus
    * is reproducible byte-for-byte.
    */
  private[graft] def scaled(spark: SparkSession, sfDir: String, k: Int,
      alphaNs: Boolean = false): DataFrame = {
    require(!alphaNs || k <= 676,
      s"alpha namespace supports <=676 replicas, got $k")
    val docs = Tables.documents(spark, sfDir)
    val n = lit(1000000L) // id stride safely above any sf0.1 doc_id
    (0 until k).map { rep =>
      // ≤26 replicas keep the single-letter namespace so every
      // previously recorded probe corpus stays byte-reproducible; a
      // bigger sweep (the q122 knee hunt) switches the WHOLE corpus to
      // two letters — uniform within a corpus, so replicas stay
      // mutually shingle-disjoint
      val ns =
        if (!alphaNs) s"r${rep}_"
        else if (k <= 26) s"r${('a' + rep).toChar}_"
        else s"r${('a' + rep / 26).toChar}${('a' + rep % 26).toChar}_"
      docs.select(
        (col("doc_id") + n * rep).as("doc_id"),
        col("lang"),
        col("source"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(ns), t)), " ").as("text"))
    }.reduce(_ unionAll _)
      // recomputed from the prefixed text (keeper-policy queries read it)
      .withColumn("n_chars", length(col("text")))
  }

  /** K× embeddings for the vector-path probes (q84): replica vectors
    * keep their values (centroid assignment work scales with corpus
    * size) under strided ids, so the `vec_id < 8` centroid set stays
    * the ORIGINAL 8 — corpus grows K×, centroid count constant, which
    * is the real shape (cluster count doesn't grow with data).
    */
  private def scaledEmbeddings(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir)
    val n = lit(1000000L)
    (0 until k).map { rep =>
      val shifted = vecs.select((col("vec_id") + n * rep).as("vec_id"),
        col("embedding"), col("label"))
      // replicas beyond the first must not re-enter the centroid set
      if (rep == 0) shifted else shifted.filter(col("vec_id") % n >= 8)
    }.reduce(_ unionAll _)
  }

  /** K× embeddings for the SEMANTIC-dedup probe (q108): replica `rep`
    * gets its dimensions cyclically rotated by `rep` positions — a
    * coordinate permutation is orthogonal, so every INTRA-replica cosine
    * (and hence each replica's near-dup pair structure) is preserved
    * exactly, while INTER-replica cosines scramble to ~0. This is the
    * embedding analog of [[scaled]]'s `r<k>_` token namespacing: K× data
    * is K independent copies of the same semantic-dedup problem, so true
    * drop counts scale exactly K. Verbatim replication would instead
    * make every replica a cos=1.0 dup of its original and grow the TRUE
    * pair count quadratically in K — measuring output explosion, not
    * engine scaling.
    */
  private def scaledEmbeddingsShifted(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir)
    val n = lit(1000000L)
    val dim = 64
    (0 until k).map { rep =>
      // replica `rep` gets the coordinate permutation i ↦ (a·i + b) mod
      // dim with a odd (invertible mod 64): orthogonal, so intra-replica
      // cosines — and each replica's near-dup structure — are preserved
      // exactly, while inter-replica cosines scramble. For rep < 64
      // this is the original cyclic rotation (a = 1), byte-compatible
      // with every recorded probe corpus; a > 1 extends replica
      // independence past 64 replicas (the knee hunt), where plain
      // rotations would repeat and replica r would be a cos=1 twin of
      // r−64.
      val a = 2 * (rep / dim) + 1
      val b = rep % dim
      val perm =
        if (a == 1 && b == 0) col("embedding")
        else array((0 until dim).map(i =>
          col("embedding")((a * i + b) % dim)): _*)
      vecs.select((col("vec_id") + n * rep).as("vec_id"),
        perm.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
  }

  /** K× corpus where HALF of each replica's docs are a near-dup flood:
    * 30 shared namespace tokens + one unique token per doc, so flood
    * members band-collide into buckets holding ~|replica|/2 docs
    * (jaccard ~0.9 between any two). The adversarial input the
    * `maxBucket` guards exist for — one bucket owning 50% of the
    * corpus, quadratic if paired naively.
    */
  private def skewedDocs(spark: SparkSession, sfDir: String, k: Int,
      floodPct: Int = 50, boilerLen: Int = 30): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = lit(1000000L)
    val boiler = (0 until boilerLen).map(w => s"b$w")
    (0 until k).map { rep =>
      val flood = concat_ws(" ",
        (boiler.map(t => lit(s"r${rep}_$t")) :+
          concat(lit(s"r${rep}_u"), col("doc_id"))): _*)
      val honest = array_join(transform(split(col("text"), " "),
        t => concat(lit(s"r${rep}_"), t)), " ")
      docs.select((col("doc_id") + n * rep).as("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(100)) < floodPct, flood)
          .otherwise(honest).as("text"))
    }.reduce(_ unionAll _)
      .withColumn("n_chars", length(col("text")))
  }

  /** K× embeddings where HALF of each replica's vectors collapse onto
    * one tight cluster (unit direction + per-vector 1e-5 jitter): one
    * IVF cell ends up owning ~50% of the corpus however k was sized —
    * the input [[graft.ext.Dedup.semanticDropList]]'s `maxCell`
    * tiers exist for. Replica directions rotate so replicas stay
    * mutually dissimilar; seed rows (vec_id < 16) keep their original
    * vectors so trained/seeded centroid sets stay honest.
    */
  private def skewedEmbeddings(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir)
    val n = lit(1000000L)
    val dim = 64
    (0 until k).map { rep =>
      // ONE direction across ALL replicas: the hot cell grows with K —
      // the "one cell holds 50% of the corpus" adversary (per-replica
      // directions would give K independent caps-sized floods instead)
      val hot = array((0 until dim).map { d =>
        if (d == 0) lit(1.0f)
        else if (d == 1)
          ((col("vec_id") % 100000L).cast("float") +
            lit(rep * 100000.0f)) * 1e-7f
        else lit(0.0f)
      }: _*)
      vecs.select((col("vec_id") + n * rep).as("vec_id"),
        when(col("vec_id") % 2 === 0 && col("vec_id") >= 16, hot)
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)
  }

  /** `--skew` mode: the join-heavy family on the deliberately skewed
    * replicas — runtime must track the CAPS, not the flood. Also runs
    * the uncapped band join once with AQE skew-join thresholds lowered
    * to probe scale, recording whether Spark's own skew splitting
    * engaged (it parallelizes the flood's quadratic output; only the
    * cap removes it — the two mitigations are complementary, and the
    * row pair shows which does what).
    */

  /** The AQE legs, run ONCE on purpose-sized corpora (independent of
    * the multiplier sweep):
    *  (a) decontamination's exact code join on a 90%-flood / 5-token-
    *      boilerplate corpus — the flood shares exactly ONE 5-gram
    *      code, so a single reduce partition owns ~half the exploded
    *      train side's bytes: INPUT-byte skew, the class
    *      OptimizeSkewedJoin's partition-size test sees (a 30-token
    *      boilerplate spreads ~27 equally-hot codes uniformly over the
    *      partitions and the rule correctly declines — no outlier);
    *  (b) the uncapped LSH band join on the 30-token flood — its cost
    *      is the hot bucket's m²/2 OUTPUT pairs generated from
    *      byte-tiny input partitions: skew no partition-size heuristic
    *      can see, recorded as the negative result motivating the
    *      operator-level caps.
    */
  private def aqeLegs(spark: SparkSession, sfDir: String): Unit = {
    import graft.ext.Dedup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the shingle/signature tables are CACHED; by default AQE refuses
    // to re-partition plans reading cached relations, which silently
    // disables skew splitting for this whole family — the cluster-side
    // setting a real deployment flips for exactly this reason
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    // forceOptimizeSkewedJoin is NOT set here: GraftExtensions.install
    // injects it as a session default since round 13, and this probe's
    // `aqe_skew_split: true` row is the evidence that a deployment gets
    // the split without hand configuration. The byte thresholds above
    // remain probe-scale emulation (they make a toy corpus register as
    // "skewed"); production uses Spark's 256 MB defaults.
    // skew splitting works at MAPPER granularity: a hot reduce
    // partition fed by a single map task cannot be subdivided, and the
    // probe corpus is one small parquet file (one scan partition ->
    // one mapper). Small scan splits restore the multi-mapper shape a
    // real corpus has.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
    if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    def aqeRow(q: String, mult: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      Dedup.clearSignatureCaches()
      val t0 = System.nanoTime()
      // execute THIS DataFrame's own QueryExecution (count() would plan
      // a separate aggregate query, leaving df's plan initial — its
      // toString would never show the final skew markers)
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val planStr = df.queryExecution.executedPlan.toString
      val skewApplied = planStr.contains("skew=true")
      if (sys.env.contains("SPARK_GRAFT_SKEW_DEBUG"))
        planStr.linesIterator.filter(l => l.contains("Join") || l.contains("skew") || l.contains("AQEShuffleRead"))
          .foreach(l => println("PLANLINE " + l.trim.take(200)))
      println(s"""{"probe":"skew","query":"$q","mult":$mult,""" +
        s""""sec":${f"$sec%.3f"},"rows":$rows,"aqe_skew_split":$skewApplied}""")
    }
    try {
      val inDir = tempDir("skew_aqe_input")
      skewedDocs(spark, sfDir, 10, floodPct = 98, boilerLen = 5)
        .write.mode("overwrite").parquet(s"$inDir/documents.parquet")
      val inDocs = Tables.documents(spark, inDir)
      aqeRow("q66_decontam_exact_aqe", 10,
        Dedup.contamination(inDocs,
          inDocs.filter(pmod(col("doc_id"), lit(100)) < 3)))
      // the SAME code join with both sides SHUFFLE-ADJACENT (no
      // distinct/aggregate between the exchange and the join): the
      // only shape OptimizeSkewedJoin's pattern matches — the
      // true-positive control proving the engine CAN split this skew
      // when the plan exposes it
      val lCodes = inDocs.select(col("doc_id"),
        explode(graft.ext.TextStats.tokens(coalesce(col("text"), lit("")))).as("term"))
      val rCodes = inDocs.filter(pmod(col("doc_id"), lit(100)) < 3)
        .select(col("doc_id").as("h_doc"),
          explode(graft.ext.TextStats.tokens(coalesce(col("text"), lit("")))).as("term"))
      aqeRow("q66_shuffle_adjacent_join_aqe", 10,
        lCodes.join(rCodes, Seq("term"))
          .select(col("doc_id"), col("h_doc")))
      val outDir = tempDir("skew_aqe_output")
      skewedDocs(spark, sfDir, 1, floodPct = 90, boilerLen = 30)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      aqeRow("q21_minhash_UNCAPPED_aqe", 1,
        Dedup.minhashPairs(Tables.documents(spark, outDir),
          minJaccard = 0.7, maxBucket = Int.MaxValue))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      Dedup.clearSignatureCaches()
    }
  }

  private def skewProbe(spark: SparkSession, sfDir: String,
      mults: Seq[Int]): Unit = {
    import graft.ext.{Dedup, Similarity}
    for (k <- mults) {
      val dir = tempDir(s"skew_${k}x")
      skewedDocs(spark, sfDir, k).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      skewedEmbeddings(spark, sfDir, k).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      def row(q: String, f: => Long): Unit = {
        Dedup.clearSignatureCaches()
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"probe":"skew","query":"$q","mult":$k,""" +
          s""""sec":${f"$sec%.3f"},"rows":$rows}""")
      }
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      row("q21_minhash_capped",
        Dedup.minhashPairs(docs, minJaccard = 0.7).count())
      row("q94_containment_capped",
        Dedup.containmentPairs(docs, minContainment = 0.7).count())
      val cents = Similarity.kmeansCentroids(emb, 16, 1, 4)
      row("q108_semdedup_capped",
        Dedup.semanticDropList(emb, docs, cents, minCos = 0.35,
          maxCell = 2000).count())
      // uncapped reference only at small multipliers: it is the
      // quadratic case the caps remove (|flood|²/2 pairs in the one
      // growing hot cell)
      if (k <= 5) {
        row("q108_semdedup_UNCAPPED",
          Dedup.semanticDropList(emb, docs, cents, minCos = 0.35).count())
      }
      Dedup.clearSignatureCaches()
    }
    aqeLegs(spark, sfDir)
  }

  /** `--stream-curation` mode: the streaming-ingest SOAK the 2–3-batch
    * CurationStreamSpec cannot see — N≥20 micro-batches through
    * [[graft.streaming.CurationStream.ingestStream]] at 1–K× delta
    * sizes, TWO legs per multiplier (plain append vs compaction every 5
    * batches, the table-maintenance cadence), a mid-stream redaction,
    * and a final manifest-parity assertion between the legs (compaction
    * + redaction must not move one offset). Emits docs/s, the
    * batch-time trend (median of the first vs last 5 batches — the
    * plain leg's file pileup shows up here if it ever matters), and the
    * final data-file/bucket counts.
    *
    * Maintenance runs BETWEEN micro-batches (the stream is idle after
    * `processAllAvailable`) — the coordination a table format's
    * compaction service provides in production.
    */
  private def streamCurationProbe(spark: SparkSession, sfDir: String,
      mults: Seq[Int], nBatches: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    for (k <- mults) {
      val dir = tempDir(s"soak_${k}x")
      // digit-free namespace (the clean stage scrubs digits) + the
      // structure-preserving embedding replication — the q117/q122
      // probe corpus discipline
      scaled(spark, sfDir, k, alphaNs = true).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      scaledEmbeddingsShifted(spark, sfDir, k).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val cl = graft.queries.Curation.clean(docs)
      val bucket = pmod(pmod(col("doc_id"), lit(1000000000L)) * 2654435761L,
        lit(100L))
      // seed store = the cleaned non-delta corpus; frozen holdout = its
      // q51 eval split (the q122 shapes, minus the stage-2–6 chain the
      // soak does not re-measure)
      val seed = cl.filter(pmod(col("doc_id"), lit(7L)) =!= 0L &&
        bucket < 80L)
      val holdout = cl.filter(pmod(col("doc_id"), lit(7L)) =!= 0L &&
        bucket >= 80L)
      val trained = graft.ext.Similarity
        .kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
      // delta slices: batch i = the i-th residue class of the delta ids
      val delta = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
      val slices = (0 until nBatches).map(i => delta
        .filter(pmod(expr("doc_id DIV 7"), lit(nBatches.toLong)) === i.toLong)
        .select($"doc_id", $"lang", $"source", $"n_chars", $"text")
        .as[(Long, String, String, Long, String)].collect().toSeq)
      val docsIn = slices.map(_.size).sum
      val redactAfter = nBatches / 2

      def dataFileCount(storeDir: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
          else if (f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) 1
          else 0
        walk(new java.io.File(storeDir))
      }

      // Spark jobs per micro-batch — the job FLOOR the round-12 soak
      // identified as the product's batch latency. Listener events are
      // async; the median over N batches absorbs the boundary slop.
      val jobCount = new java.util.concurrent.atomic.AtomicLong
      val jobListener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(jobListener)

      def leg(name: String, compactEvery: Int): (Set[Seq[Any]], String) = {
        val storeDir = tempDir(s"soak_store_${k}x_$name")
        val ckpt = tempDir(s"soak_ckpt_${k}x_$name")
        graft.streaming.CurationStream.initStore(
          seed.select($"doc_id", $"lang", $"source", $"n_chars", $"text"),
          storeDir)
        val in = MemoryStream[(Long, String, String, Long, String)]
        val q = graft.streaming.CurationStream.ingestStream(
          in.toDF().toDF("doc_id", "lang", "source", "n_chars", "text"),
          emb, trained, holdout, storeDir, ckpt)
        val batchSec = Array.ofDim[Double](nBatches)
        val batchJobs = Array.ofDim[Long](nBatches)
        var redactIds: Seq[Long] = Seq.empty
        val t0 = System.nanoTime()
        (0 until nBatches).foreach { i =>
          val b0 = System.nanoTime()
          val j0 = jobCount.get()
          in.addData(slices(i): _*)
          q.processAllAvailable()
          batchSec(i) = (System.nanoTime() - b0) / 1e9
          batchJobs(i) = jobCount.get() - j0
          if ((i + 1) % 5 == 0)
            println(s"""{"probe":"stream_curation_progress","mult":$k,""" +
              s""""leg":"$name","batch":${i + 1},""" +
              s""""cum_sec":${f"${batchSec.take(i + 1).sum}%.1f"}}""")
          if (compactEvery > 0 && (i + 1) % compactEvery == 0)
            graft.streaming.CurationStream.compactStore(spark, storeDir)
          if (i + 1 == redactAfter) {
            // mid-stream compliance request against batch 0's docs
            // deterministic victim choice: an unordered limit(3) could
            // pick different doc_ids per leg (different file layouts),
            // and redaction removes dedup protection for the redacted
            // text — divergent victims could break the parity gate
            redactIds = graft.streaming.CurationStream
              .readStore(spark, storeDir)
              .filter($"ingest_batch" === 0L).select($"doc_id")
              .orderBy($"doc_id").limit(3).collect().map(_.getLong(0)).toSeq
            graft.streaming.CurationStream
              .redactStore(spark, storeDir, redactIds)
          }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        q.stop(); q.awaitTermination()
        val store = graft.streaming.CurationStream.readStore(spark, storeDir)
        val accepted = store.filter($"ingest_batch" >= 0L).count()
        val view = graft.streaming.CurationStream.manifestView(store)
          .collect().map(_.toSeq).toSet
        def med(xs: Seq[Double]): Double = {
          val s = xs.sorted; s(s.size / 2)
        }
        val row =
          s""""leg":"$name","batches":$nBatches,"docs_in":$docsIn,""" +
            s""""accepted":$accepted,"sec":${f"$sec%.3f"},""" +
            s""""docs_per_sec":${f"${docsIn / sec}%.1f"},""" +
            s""""batch_sec_first5":${f"${med(batchSec.take(5).toSeq)}%.3f"},""" +
            s""""batch_sec_last5":${f"${med(batchSec.takeRight(5).toSeq)}%.3f"},""" +
            s""""batch_sec_med":${f"${med(batchSec.toSeq)}%.3f"},""" +
            s""""jobs_per_batch_med":${med(batchJobs.map(_.toDouble).toSeq).toLong},""" +
            s""""files_final":${dataFileCount(storeDir)},""" +
            s""""buckets":${graft.streaming.CurationStream
              .liveBuckets(storeDir).size},"redacted":${redactIds.size}"""
        graft.ext.Dedup.clearSignatureCaches()
        (view, row)
      }

      val (viewPlain, rowPlain) = leg("plain", compactEvery = 0)
      val (viewCompact, rowCompact) = leg("compact", compactEvery = 5)
      spark.sparkContext.removeSparkListener(jobListener)
      val parity = viewPlain == viewCompact
      println(s"""{"probe":"stream_curation","mult":$k,$rowPlain,"parity":$parity}""")
      println(s"""{"probe":"stream_curation","mult":$k,$rowCompact,"parity":$parity}""")
      require(parity, "compaction/redaction changed the manifest view — " +
        "the soak's parity contract is broken")
    }
  }

  /** `--store-evolve` mode: MAINTENANCE-HEAVY multi-round store
    * evolution — the lifecycle the 20-batch soak cannot see. `nBatches`
    * micro-batches (default 100) through one `ingestStream` instance
    * with compaction every 5 batches and redactions at n/4, n/2, 3n/4
    * (3 deterministic victims each), every maintenance op's wall-clock
    * and rewritten bytes recorded as a series. Two parity gates at the
    * end:
    *
    *  1. a PLAIN leg (same redactions — they change dedup semantics —
    *     but zero compactions) must produce a row-identical manifest
    *     view: 20+ compactions across the horizon moved no offset;
    *  2. a FROM-SCRATCH REPLAY of the surviving inputs (seed + exactly
    *     the accepted delta rows, appended batch-by-batch into a fresh
    *     store) must reproduce the manifest view bit-for-bit: after
    *     ~100 rounds of churn the durable state is still precisely the
    *     deterministic function of what survived — no maintenance
    *     residue, no offset drift, no attribution loss.
    */
  private def storeEvolveProbe(spark: SparkSession, sfDir: String,
      nBatches: Int, mult: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = tempDir("evolve_corpus")
    scaled(spark, sfDir, mult, alphaNs = true).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    scaledEmbeddingsShifted(spark, sfDir, mult).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val cl = graft.queries.Curation.clean(docs)
    val bucket = pmod(pmod(col("doc_id"), lit(1000000000L)) * 2654435761L,
      lit(100L))
    val seed = cl.filter(pmod(col("doc_id"), lit(7L)) =!= 0L && bucket < 80L)
    val holdout = cl.filter(pmod(col("doc_id"), lit(7L)) =!= 0L &&
      bucket >= 80L)
    val trained = graft.ext.Similarity
      .kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
    val delta = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
    val slices = (0 until nBatches).map(i => delta
      .filter(pmod(expr("doc_id DIV 7"), lit(nBatches.toLong)) === i.toLong)
      .select($"doc_id", $"lang", $"source", $"n_chars", $"text")
      .as[(Long, String, String, Long, String)].collect().toSeq)
    val redactAt = Set(nBatches / 4, nBatches / 2, 3 * nBatches / 4)

    def fileState(storeDir: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else if (f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")) Seq(f)
        else Seq.empty
      walk(new java.io.File(storeDir))
        .map(f => f.getPath -> (f.length, f.lastModified)).toMap
    }

    // victims per redaction point, chosen ONCE (oldest live ingest
    // batch, min doc_ids) and shared across legs — divergent victim
    // sets would legitimately diverge the manifests
    val victimsAt = scala.collection.mutable.Map.empty[Int, Seq[Long]]

    def leg(name: String, compactEvery: Int): (Set[Seq[Any]], String, String) = {
      val storeDir = tempDir(s"evolve_store_$name")
      val ckpt = tempDir(s"evolve_ckpt_$name")
      graft.streaming.CurationStream.initStore(
        seed.select($"doc_id", $"lang", $"source", $"n_chars", $"text"),
        storeDir)
      val in = MemoryStream[(Long, String, String, Long, String)]
      val q = graft.streaming.CurationStream.ingestStream(
        in.toDF().toDF("doc_id", "lang", "source", "n_chars", "text"),
        emb, trained, holdout, storeDir, ckpt)
      val batchSec = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { i =>
        val b0 = System.nanoTime()
        in.addData(slices(i): _*)
        q.processAllAvailable()
        batchSec += (System.nanoTime() - b0) / 1e9
        def maint(op: String)(body: => Unit): Unit = {
          val before = fileState(storeDir)
          val m0 = System.nanoTime()
          body
          val sec = (System.nanoTime() - m0) / 1e9
          val after = fileState(storeDir)
          val rewritten = after
            .filterNot { case (p, st) => before.get(p).contains(st) }
            .values.map(_._1).sum
          println(s"""{"probe":"store_evolve_maint","leg":"$name",""" +
            s""""batch":${i + 1},"op":"$op","sec":${f"$sec%.3f"},""" +
            s""""rewritten_bytes":$rewritten,""" +
            s""""store_bytes":${after.values.map(_._1).sum}}""")
        }
        if (compactEvery > 0 && (i + 1) % compactEvery == 0)
          maint("compact")(graft.streaming.CurationStream
            .compactStore(spark, storeDir))
        if (redactAt(i + 1)) {
          val ids = victimsAt.getOrElseUpdate(i + 1, {
            val oldest = graft.streaming.CurationStream
              .readStore(spark, storeDir)
              .filter($"ingest_batch" >= 0L && $"text".isNotNull)
              .select($"ingest_batch").agg(min($"ingest_batch"))
              .head().getLong(0)
            graft.streaming.CurationStream.readStore(spark, storeDir)
              .filter($"ingest_batch" === oldest && $"text".isNotNull)
              .select($"doc_id").orderBy($"doc_id").limit(3)
              .collect().map(_.getLong(0)).toSeq
          })
          maint("redact")(graft.streaming.CurationStream
            .redactStore(spark, storeDir, ids))
        }
        if ((i + 1) % 10 == 0)
          println(s"""{"probe":"store_evolve_progress","leg":"$name",""" +
            s""""batch":${i + 1},"cum_sec":${f"${batchSec.sum}%.1f"}}""")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop(); q.awaitTermination()
      val store = graft.streaming.CurationStream.readStore(spark, storeDir)
      val accepted = store.filter($"ingest_batch" >= 0L).count()
      val view = graft.streaming.CurationStream.manifestView(store)
        .collect().map(_.toSeq).toSet
      def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
      val row = s""""leg":"$name","batches":$nBatches,""" +
        s""""accepted":$accepted,"sec":${f"$sec%.1f"},""" +
        s""""batch_sec_med":${f"${med(batchSec.toSeq)}%.3f"},""" +
        s""""files_final":${fileState(storeDir).size},""" +
        s""""buckets":${graft.streaming.CurationStream
          .liveBuckets(storeDir).size}"""
      graft.ext.Dedup.clearSignatureCaches()
      (view, row, storeDir)
    }

    val (viewMaint, rowMaint, maintStore) = leg("maintained", compactEvery = 5)
    val (viewPlain, rowPlain, _) = leg("plain", compactEvery = 0)
    val maintParity = viewMaint == viewPlain

    // from-scratch replay of the surviving inputs: seed + exactly the
    // accepted rows, appended with their original batch ids — the
    // manifest view is a pure function of these rows, so it must
    // reproduce bit-for-bit (redacted rows' text differs, but the view
    // never reads text)
    val survivors = graft.streaming.CurationStream
      .readStore(spark, maintStore)
      .filter($"ingest_batch" >= 0L)
      .select($"doc_id", $"ingest_batch").as[(Long, Long)]
      .collect().toMap
    val replayDir = tempDir("evolve_store_replay")
    graft.streaming.CurationStream.initStore(
      seed.select($"doc_id", $"lang", $"source", $"n_chars", $"text"),
      replayDir)
    (0 until nBatches).foreach { i =>
      val rows = slices(i).filter(r => survivors.get(r._1).contains(i.toLong))
      if (rows.nonEmpty)
        graft.streaming.CurationStream.appendStore(
          graft.queries.Curation.clean(
            rows.toDF("doc_id", "lang", "source", "n_chars", "text"))
            .select($"doc_id", $"lang", $"source", $"n_chars", $"text",
              coalesce(size(graft.ext.TextStats.tokens($"text")), lit(0))
                .cast("long").as("n_tok"), lit(i.toLong).as("ingest_batch")),
          replayDir)
    }
    val viewReplay = graft.streaming.CurationStream.manifestView(
      graft.streaming.CurationStream.readStore(spark, replayDir))
      .collect().map(_.toSeq).toSet
    val replayParity = viewMaint == viewReplay

    println(s"""{"probe":"store_evolve","mult":$mult,$rowMaint,""" +
      s""""maint_parity":$maintParity,"replay_parity":$replayParity}""")
    println(s"""{"probe":"store_evolve","mult":$mult,$rowPlain,""" +
      s""""maint_parity":$maintParity}""")
    require(maintParity,
      "maintenance-heavy evolution diverged from the plain leg")
    require(replayParity,
      "the evolved store's manifest does not equal a replay of its survivors")
  }

  /** `--longdoc` mode: measure what the hash-led exact-dedup shuffle
    * key buys on LONG documents. The adversarial-but-realistic corpus:
    * docs share a ~96k-char boilerplate PREFIX (the shape of template-
    * heavy scrapes) and differ only in a short tail, with each distinct
    * text duplicated ~dupFactor×. A raw-text sort comparator walks the
    * whole shared prefix on EVERY comparison; the (xxhash64, text) key
    * compares 8 bytes unless the row is a true duplicate. Two timed
    * variants over the identical corpus:
    *   raw  — window partitioned by text alone (the pre-round-12 plan)
    *   hash — [[graft.queries.Curation.exactKeepMin]] (the production
    *          stage-3 operator, hash-led)
    * Equal survivor counts are asserted — the discipline is a pure
    * plan change.
    */
  private def longDocProbe(spark: SparkSession, nDocs: Int,
      prefixTokens: Int, dupFactor: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val nDistinct = math.max(1, nDocs / dupFactor)
    val dir = tempDir("longdoc")
    spark.range(nDocs.toLong).select(
      $"id".as("doc_id"),
      concat(
        array_join(array_repeat(lit("boilerplate"), prefixTokens), " "),
        lit(" tail"), ($"id" % nDistinct).cast("string")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val len = docs.select(max(length($"text"))).head().getInt(0)
    def timed(variant: String)(df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"longdoc","variant":"$variant","n_docs":$nDocs,""" +
        s""""doc_chars":$len,"dup_factor":$dupFactor,""" +
        s""""sec":${f"$sec%.3f"},"rows":$n}""")
      n
    }
    val rawW = Window.partitionBy($"text").orderBy($"doc_id")
    val raw = timed("raw_text_key")(docs
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(rawW))
      .filter($"rn" === 1).drop("rn"))
    val hash = timed("hash_led_key")(
      graft.queries.Curation.exactKeepMin(docs))
    require(raw == hash, s"variants disagree: raw=$raw hash=$hash")
  }

  /** `--redact-bytes` mode: the O(touched) claim in BYTES. Builds a
    * curation store of 480 ingest batches (30 batch-bucket partitions)
    * at each multiplier via the shared [[graft.streaming.CurationStream
    * .appendStore]] writer, redacts 3 docs from batch 0, and reports
    * bytes REWRITTEN (files whose (path, length, mtime) changed) vs
    * total store bytes — the number a per-compliance-request bill is
    * made of. The round-11 implementation rewrote 100% of the store
    * per request; the bucketed layout rewrites one partition.
    */
  private def redactBytesProbe(spark: SparkSession, sfDir: String,
      mults: Seq[Int]): Unit = {
    import spark.implicits._
    for (k <- mults) {
      val dir = tempDir(s"redactb_${k}x")
      scaled(spark, sfDir, k).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val docs = Tables.documents(spark, dir)
      val storeDir = tempDir(s"redactb_store_${k}x")
      graft.streaming.CurationStream.appendStore(
        docs.select($"doc_id", $"lang", $"source", $"n_chars", $"text",
          coalesce(size(graft.ext.TextStats.tokens($"text")), lit(0))
            .cast("long").as("n_tok"),
          pmod($"doc_id", lit(480L)).as("ingest_batch")),
        storeDir, mode = "overwrite")
      def fileState(): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
          else if (f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) Seq(f)
          else Seq.empty
        walk(new java.io.File(storeDir))
          .map(f => f.getPath -> (f.length, f.lastModified)).toMap
      }
      val before = fileState()
      val totalBytes = before.values.map(_._1).sum
      val victims = docs.filter(pmod($"doc_id", lit(480L)) === 0L)
        .select($"doc_id").limit(3).collect().map(_.getLong(0)).toSeq
      val t0 = System.nanoTime()
      graft.streaming.CurationStream.redactStore(spark, storeDir, victims)
      val sec = (System.nanoTime() - t0) / 1e9
      val after = fileState()
      // rewritten = new/changed files' bytes (the swapped partition)
      val rewritten = after
        .filterNot { case (p, st) => before.get(p).contains(st) }
        .values.map(_._1).sum
      val buckets = graft.streaming.CurationStream.liveBuckets(storeDir).size
      println(s"""{"probe":"redact_bytes","mult":$k,""" +
        s""""store_bytes":$totalBytes,"rewritten_bytes":$rewritten,""" +
        s""""rewritten_pct":${f"${rewritten * 100.0 / totalBytes}%.1f"},""" +
        s""""buckets":$buckets,"redacted":${victims.size},""" +
        s""""sec":${f"$sec%.3f"}}""")
    }
  }

  /** `--redact-mass` mode: a compliance-scale redaction — `nIds`
    * tombstones (a TABLE, not a driver list) against a synthetic
    * multi-bucket store. The round-12 `isin`-literal form would have
    * planned a 100k-term In expression (plan-size/codegen hazard);
    * the join form must finish with a flat plan regardless of the
    * tombstone count. Emits victims-confirmed + wall-clock.
    */
  private def redactMassProbe(spark: SparkSession, nDocs: Int,
      nIds: Int): Unit = {
    import spark.implicits._
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val byteListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null)
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        ()
      }
    }
    def measured[T](f: => T): (T, Long, Double) = {
      spark.sparkContext.addSparkListener(byteListener)
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async (private bus, no public flush):
      // settle briefly before reading the counter
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(byteListener)
      (r, bytesRead.get(), sec)
    }
    def freshStore(name: String): String = {
      val dir = tempDir(name)
      val rows = spark.range(nDocs.toLong).select(
        $"id".as("doc_id"), lit("en").as("lang"), lit("web").as("source"),
        lit(64L).as("n_chars"),
        concat(lit("alpha beta gamma delta body "),
          ($"id" % 97L).cast("string")).as("text"),
        lit(8L).as("n_tok"),
        pmod($"id", lit(128L)).as("ingest_batch"))
      graft.streaming.CurationStream.appendStore(rows, dir,
        mode = "overwrite")
      // seal the store: the first maintenance pass builds every
      // bucket's doc_id sidecar (one-time O(store) backfill)
      graft.streaming.CurationStream.compactStore(spark, dir)
      dir
    }
    def storeBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else if (f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".") &&
          !f.getParentFile.getName.startsWith("_")) f.length
        else 0L
      walk(new java.io.File(dir))
    }

    // LEG 1 — discovery boundedness: tombstones CONCENTRATED in one
    // batch bucket (ids with ingest_batch 0..15). The sidecars must
    // prune discovery to ~that bucket: bytes read across the whole
    // redaction (discovery + rewrite + sidecar rebuild) stay a
    // fraction of the store, not a multiple of it.
    val dir1 = freshStore("redact_mass_bounded")
    val sb = storeBytes(dir1)
    val buckets1 = graft.streaming.CurationStream.liveBuckets(dir1).size
    val nIds1 = math.min(nIds.toLong, nDocs.toLong / 8L)
    val tomb1 = spark.range(nIds1).select(
      expr("(id DIV 16) * 128 + (id % 16)").cast("long").as("doc_id"))
      .filter($"doc_id" < nDocs.toLong)
    val expected1 = tomb1.count()
    val (_, bytes1, sec1) = measured(
      graft.streaming.CurationStream.redactStore(spark, dir1, tomb1))
    val redacted1 = graft.streaming.CurationStream.readStore(spark, dir1)
      .filter($"text".isNull).count()
    println(s"""{"probe":"redact_mass_bounded","docs":$nDocs,""" +
      s""""tombstones":$expected1,"redacted":$redacted1,""" +
      s""""buckets":$buckets1,"touched_buckets":1,""" +
      s""""store_bytes":$sb,"bytes_read":$bytes1,""" +
      s""""read_fraction":${f"${bytes1.toDouble / sb}%.3f"},""" +
      s""""sec":${f"$sec1%.3f"}}""")
    require(redacted1 == expected1,
      s"bounded redaction nulled $redacted1 rows, expected $expected1")
    require(bytes1 < sb,
      s"discovery read $bytes1 bytes against a $sb-byte store — " +
        "the sidecar prune is not bounding it")

    // LEG 1b — append-time sidecar coverage: the same bounded
    // redaction against a store that has NEVER seen a maintenance
    // pass, built the way the STREAM builds it (per-batch appendStore
    // with the (bucket, ids) proof, sidecars MERGED at append time).
    // Discovery must stay < store bytes on those sidecars alone —
    // before round 15 a never-compacted store had no sidecars at all
    // and every compliance call scanned the whole doc_id column.
    val dir1b = tempDir("redact_mass_hot")
    val batches = 128
    val perBatch = math.max(1, nDocs / batches)
    val docs1b = batches.toLong * perBatch // the ACTUAL store size (the
    // batch grid rounds nDocs; reporting nDocs would overstate it)
    (0 until batches).foreach { bb =>
      val lo = bb.toLong * perBatch
      val rows = spark.range(lo, lo + perBatch).select(
        $"id".as("doc_id"), lit("en").as("lang"), lit("web").as("source"),
        lit(64L).as("n_chars"),
        concat(lit("alpha beta gamma delta body "),
          ($"id" % 97L).cast("string")).as("text"),
        lit(8L).as("n_tok"), lit(bb.toLong).as("ingest_batch"))
      graft.streaming.CurationStream.appendStore(rows, dir1b,
        touchedBuckets = Some(Seq(
          bb.toLong / graft.streaming.CurationStream.BatchesPerBucket)),
        newIds = Some((lo until lo + perBatch).toArray))
    }
    val sb1b = storeBytes(dir1b)
    val buckets1b = graft.streaming.CurationStream.liveBuckets(dir1b).size
    // tombstones concentrated in the FIRST bucket (batches 0..15)
    val tomb1b = spark.range(nIds1)
      .filter($"id" < 16L * perBatch).select($"id".as("doc_id"))
    val expected1b = tomb1b.count()
    val (_, bytes1b, sec1b) = measured(
      graft.streaming.CurationStream.redactStore(spark, dir1b, tomb1b))
    val redacted1b = graft.streaming.CurationStream.readStore(spark, dir1b)
      .filter($"text".isNull).count()
    println(s"""{"probe":"redact_mass_hot_uncompacted","docs":$docs1b,""" +
      s""""tombstones":$expected1b,"redacted":$redacted1b,""" +
      s""""buckets":$buckets1b,"store_bytes":$sb1b,""" +
      s""""bytes_read":$bytes1b,""" +
      s""""read_fraction":${f"${bytes1b.toDouble / sb1b}%.3f"},""" +
      s""""sec":${f"$sec1b%.3f"}}""")
    require(redacted1b == expected1b,
      s"hot-store redaction nulled $redacted1b rows, expected $expected1b")
    require(bytes1b < sb1b,
      s"discovery read $bytes1b bytes against a $sb1b-byte NEVER-" +
        "compacted store — append-time sidecars are not bounding it")

    // LEG 2 — compliance-scale mass redaction across every bucket
    // (every other doc): the flat-plan tombstone-TABLE contract
    val dir2 = freshStore("redact_mass_store")
    val buckets2 = graft.streaming.CurationStream.liveBuckets(dir2).size
    val tomb2 = spark.range(nIds.toLong).select(($"id" * 2L).as("doc_id"))
    val (_, bytes2, sec2) = measured(
      graft.streaming.CurationStream.redactStore(spark, dir2, tomb2))
    val redacted2 = graft.streaming.CurationStream.readStore(spark, dir2)
      .filter($"text".isNull).count()
    val expected2 = math.min(nIds.toLong, (nDocs.toLong + 1) / 2)
    println(s"""{"probe":"redact_mass","docs":$nDocs,"tombstones":$nIds,""" +
      s""""redacted":$redacted2,"buckets":$buckets2,""" +
      s""""bytes_read":$bytes2,""" +
      s""""sec":${f"$sec2%.3f"}}""")
    require(redacted2 == expected2,
      s"mass redaction nulled $redacted2 rows, expected $expected2")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--redact-mass")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(200000)
      val nIds = args.lift(2).map(_.toInt).getOrElse(100000)
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try redactMassProbe(spark, nDocs, nIds)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    if (args.headOption.contains("--redact-bytes")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val mults = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(1, 10))
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try redactBytesProbe(spark, sfDir, mults)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    if (args.headOption.contains("--longdoc")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(20000)
      val prefixTokens = args.lift(2).map(_.toInt).getOrElse(8000)
      val dupFactor = args.lift(3).map(_.toInt).getOrElse(3)
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try longDocProbe(spark, nDocs, prefixTokens, dupFactor)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    if (args.headOption.contains("--store-evolve")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
      val nBatches = args.lift(2).map(_.toInt).getOrElse(100)
      val mult = args.lift(3).map(_.toInt).getOrElse(1)
      // 8 shuffle partitions for the same reason as the soak: a
      // lifecycle probe of tiny micro-batches measures mechanics, and
      // 32 near-empty tasks/stage is pure scheduling floor
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try storeEvolveProbe(spark, sfDir, nBatches, mult)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    if (args.headOption.contains("--stream-curation")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
      val mults = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(1, 10))
      val nBatches = args.lift(3).map(_.toInt).getOrElse(20)
      // 8 shuffle partitions, not the usual 32: a soak of small
      // micro-batches measures per-batch mechanics, and a ~15-stage
      // ingest × 32 near-empty tasks per stage is pure scheduling floor
      // that would swamp the signal (the first run at 32 spent ~2.5 min
      // per 3-doc batch)
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        // session-level AQE knob for soak A/B runs (the stream scopes
        // AQE off inside its own foreachBatch either way — this knob
        // exists to re-adjudicate that decision in future rounds)
        .config("spark.sql.adaptive.enabled",
          sys.env.getOrElse("SPARK_GRAFT_SOAK_AQE", "true"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try streamCurationProbe(spark, sfDir, mults, nBatches)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    if (args.headOption.contains("--skew")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val mults = args.lift(2).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(1, 2, 5, 10))
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.graft.GraftExtensions.install(spark)
      try skewProbe(spark, sfDir, mults)
      finally { spark.stop(); tempDirs.foreach(deleteRecursively) }
      return
    }
    val sfDir = args(0)
    val mults = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                else Seq(1, 2, 5, 10)
    val Queries = if (args.length > 2) args(2).split(",").map(_.trim).toSeq
                  else DefaultQueries
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)

    // probe body in try/finally: a failed query or write must not leave
    // the scaled corpus copies on /tmp (r9 advice — cleanup previously
    // ran only on the success path)
    try {
      // curation probes need the digit-free replica namespace (their
      // clean stage rewrites digits) — and therefore their own corpus,
      // so they cannot share a run with digit-namespace probes
      val curationSet = Set("q117_curation_pipeline",
        "q122_incremental_curation", "q122_incremental_scaled")
      val curation = Queries.exists(curationSet)
      require(!curation || Queries.forall(curationSet),
        "curation probes use the alpha replica namespace; run them " +
          "separately from the digit-namespace probes")
      val results = for (k <- mults) yield {
        val dir = tempDir(s"scale_${k}x")
        scaled(spark, sfDir, k, alphaNs = curation).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
        // the curation pipelines carry the semantic-dedup stage, so they
        // take the SHIFTED (structure-preserving) embedding replication
        if (Queries.exists(Set("q108_semdedup_scaled",
            "q117_curation_pipeline", "q122_incremental_curation",
            "q122_incremental_scaled"))) {
          require(!Queries.exists(Set("q84_cluster_profile",
            "q98_embedding_outliers", "q106_ivf_batch")),
            "q108_semdedup_scaled needs the SHIFTED embeddings replication;" +
              " probe it in a separate run from the verbatim-replica queries")
          scaledEmbeddingsShifted(spark, sfDir, k).write.mode("overwrite")
            .parquet(s"$dir/embeddings.parquet")
        } else if (Queries.exists(Set("q84_cluster_profile",
            "q98_embedding_outliers", "q106_ivf_batch")))
          scaledEmbeddings(spark, sfDir, k).write.mode("overwrite")
            .parquet(s"$dir/embeddings.parquet")
        val rows = for (q <- Queries) yield {
          graft.ext.Dedup.clearSignatureCaches()
          val fn = ExtraProbes.getOrElse(q, SparkEntry.queries(q))
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(s"""{"query":"$q","mult":$k,"sec":${f"$sec%.3f"},"rows":$n}""")
          (q, k, sec, n)
        }
        rows
      }

      println(f"\n${"query"}%-22s" + mults.map(k => f"${s"${k}x"}%10s").mkString)
      for (q <- Queries) {
        val line = results.flatten.filter(_._1 == q)
        println(f"$q%-22s" + line.map(r => f"${r._3}%9.2fs").mkString)
        println(f"${"  rows"}%-22s" + line.map(r => f"${r._4}%10d").mkString)
      }
    } finally {
      spark.stop()
      tempDirs.foreach(deleteRecursively)
    }
  }
}
