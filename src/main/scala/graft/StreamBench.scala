package graft

import java.net.ServerSocket
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Reassembly
import graft.streaming.{FanoutHub, FanoutSink, StreamOps}

/** Streaming-throughput probe (SCALE.md): measured sustained rows/s for
  * (a) the LIVE WIRE — a real TCP server feeding synthetic AIS datalog
  * lines through the NmeaSocket DataSource V2 source → fragment parse →
  * stateful reassembly → native decode → FanoutHub push — and (b) the
  * stateful operator family (windowed counts, watermark dedup,
  * flatMapGroupsWithState token quota) on BOTH state-store providers.
  * The stateful specs prove correctness on both stores; this records
  * the rows/s those proofs cost, burst-shaped (the whole feed arrives
  * as fast as loopback carries it, so micro-batches are large — the
  * adversarial case for state-store commit latency).
  *
  * Usage: runMain graft.StreamBench [nLive] [nStateful]
  *    or: runMain graft.StreamBench --steady [rowsPerSec] [seconds]
  *    or: runMain graft.StreamBench --sweep [rowsPerSec] [seconds]
  *    or: runMain graft.StreamBench --serve [queriesPerSec] [seconds] [nDocs]
  * Prints one JSON line per variant.
  *
  * `--steady` is the LATENCY mode the burst runs cannot measure: a
  * feeder thread emits rows at a fixed input rate into a
  * ProcessingTime-triggered query, and the probe reports per-batch
  * processing-time percentiles (p50/p95/max of `triggerExecution`)
  * over the steady window on both state-store providers — the number
  * a 100 TB ingest SLA is written against, where burst rows/s only
  * bounds throughput.
  */
object StreamBench {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val steady = args.headOption.contains("--steady")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)

    if (steady) {
      val rate = args.lift(1).map(_.toInt).getOrElse(20000)
      val secs = args.lift(2).map(_.toInt).getOrElse(20)
      for (provider <- Seq(None, Some(RocksDb)))
        steadyState(spark, rate, secs, provider)
    } else if (args.headOption.contains("--serve")) {
      val qps = args.lift(1).map(_.toInt).getOrElse(100)
      val secs = args.lift(2).map(_.toInt).getOrElse(15)
      val nDocs = args.lift(3).map(_.toInt).getOrElse(5000)
      for (provider <- Seq(None, Some(RocksDb)))
        serveLatency(spark, qps, secs, nDocs, provider)
    } else if (args.headOption.contains("--serve-ann")) {
      val qps = args.lift(1).map(_.toInt).getOrElse(100)
      val secs = args.lift(2).map(_.toInt).getOrElse(15)
      val nVecs = args.lift(3).map(_.toInt).getOrElse(20000)
      for (provider <- Seq(None, Some(RocksDb)))
        serveAnnLatency(spark, qps, secs, nVecs, provider)
    } else if (args.headOption.contains("--serve-pq")) {
      // the PQ code tier under the same stream: pair with --serve-ann
      // at equal qps/nVecs to read the float-vs-code serving delta
      val qps = args.lift(1).map(_.toInt).getOrElse(100)
      val secs = args.lift(2).map(_.toInt).getOrElse(15)
      val nVecs = args.lift(3).map(_.toInt).getOrElse(20000)
      for (provider <- Seq(None, Some(RocksDb)))
        serveAnnLatency(spark, qps, secs, nVecs, provider, pq = true)
    } else if (args.headOption.contains("--lookup")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(5000)
      val nLookups = args.lift(2).map(_.toInt).getOrElse(50)
      lookupLatency(spark, nDocs, nLookups)
    } else if (args.headOption.contains("--lookup-mt")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(5000)
      val threads = args.lift(2).map(_.toInt).getOrElse(8)
      val perThread = args.lift(3).map(_.toInt).getOrElse(300)
      lookupConcurrency(spark, nDocs, threads, perThread)
    } else if (args.headOption.contains("--serve-mixed")) {
      val nDocs = args.lift(1).map(_.toInt).getOrElse(5000)
      val threads = args.lift(2).map(_.toInt).getOrElse(8)
      val perThread = args.lift(3).map(_.toInt).getOrElse(200)
      serveMixed(spark, nDocs, threads, perThread)
    } else if (args.headOption.contains("--sweep")) {
      // the round-9 knee: windowed counts saturate at ~50k rows/s while
      // dedup holds; the documented fix is state-store parallelism. This
      // sweeps shuffle partitions (state partition count is fixed at the
      // query's FIRST start, which is why each run gets a fresh
      // checkpoint) at the knee rate and reports where p95 recovers.
      val rate = args.lift(1).map(_.toInt).getOrElse(50000)
      val secs = args.lift(2).map(_.toInt).getOrElse(15)
      for (parts <- Seq(4, 8, 16, 32); provider <- Seq(None, Some(RocksDb))) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        steadyState(spark, rate, secs, provider,
          opsFilter = Set("windowed_counts_steady"))
      }
    } else {
      val nLive = args.headOption.map(_.toInt).getOrElse(200000)
      val nState = args.lift(1).map(_.toInt).getOrElse(500000)
      for (provider <- Seq(None, Some(RocksDb))) liveWire(spark, nLive, provider)
      for (provider <- Seq(None, Some(RocksDb))) statefulFamily(spark, nState, provider)
    }
    spark.stop()
  }

  /** Fixed-rate steady-state latency: drive the two highest-state ops
    * (windowed counts, watermark dedup) at `ratePerSec` for `seconds`
    * under a 250 ms ProcessingTime trigger and report per-batch
    * `triggerExecution` percentiles. The feeder paces against the wall
    * clock (adds the rows the elapsed time owes, every ~100 ms), so a
    * slow batch shows up as LARGER following batches — backpressure
    * made visible — rather than a silently stretched test.
    */
  private def steadyState(spark: SparkSession, ratePerSec: Int, seconds: Int,
                          provider: Option[String],
                          opsFilter: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provName = setProvider(spark, provider)
    // recentProgress retains only numRecentProgressUpdates entries
    // (default 100) — a longer steady window would silently compute
    // percentiles over the TAIL only; size the buffer to the run
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (seconds * 4 + 100).toString)
    val base = 1673222400000L

    def run(op: String,
            build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_]): Unit = {
      if (opsFilter.nonEmpty && !opsFilter.contains(op)) return
      val mem = MemoryStream[(java.sql.Timestamp, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"sb_steady_${op}_$provName").toString
      val outCount = new AtomicLong
      val q = build(mem.toDS().toDF("ts", "key")).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[_], _: Long) => outCount.addAndGet(b.count()); () }
        .start()
      @volatile var stop = false
      val feeder = new Thread(() => {
        var emitted = 0L
        val t0 = System.nanoTime()
        while (!stop) {
          val owed = ((System.nanoTime() - t0) / 1e9 * ratePerSec).toLong
          if (owed > emitted) {
            val rows = (emitted until owed).map { j =>
              (new java.sql.Timestamp(base + j * 20), j % 10000)
            }
            mem.addData(rows)
            emitted = owed
          }
          Thread.sleep(100)
        }
      }, s"steady-feeder-$op")
      feeder.setDaemon(true)
      try {
        feeder.start()
        Thread.sleep(seconds * 1000L)
        stop = true
        feeder.join()
        q.processAllAvailable()
        val durs = q.recentProgress
          .filter(_.numInputRows > 0)
          .map(_.durationMs.get("triggerExecution").toLong)
          .sorted
        require(durs.nonEmpty, s"no non-empty batches in $op steady run")
        def pct(p: Double): Long = durs(math.round(p * (durs.length - 1)).toInt)
        val parts = spark.sessionState.conf.numShufflePartitions
        println(s"""{"probe":"stream_latency","op":"$op","provider":"$provName",""" +
          s""""rate_rows_per_sec":$ratePerSec,"seconds":$seconds,""" +
          s""""shuffle_partitions":$parts,""" +
          s""""batches":${durs.length},"p50_ms":${pct(0.5)},"p95_ms":${pct(0.95)},""" +
          s""""max_ms":${durs.last},"out_rows":${outCount.get()},""" +
          s""""provider_engaged":${providerEngaged(provider, ckpt)}}""")
      } finally {
        stop = true
        q.stop()
      }
    }

    run("windowed_counts_steady",
      df => StreamOps.windowedCounts(df, "ts", "key", "1 minute", "30 seconds"))
    run("dedup_within_watermark_steady",
      df => StreamOps.dedupWithinWatermark(df, "ts", Seq("key"), "30 seconds"))
  }

  /** Serving latency for the streaming-retrieval endpoint
    * ([[StreamOps.retrievalServeStream]]): ONE prebuilt BM25 index over
    * a seeded `nDocs`-doc corpus, then a feeder paces `qps` queries/s
    * (3 random vocab terms each) into the serving stream and the probe
    * reports per-batch `triggerExecution` percentiles — the end-to-end
    * number (watermark dedup + postings probe + score + top-k + result
    * collect) a retrieval SLA is written against. Index build cost is
    * deliberately OUTSIDE the measured path: that is the serving
    * split's whole point. No trigger is set, so batches fire as fast as
    * results drain — batch latency IS the serving latency, and the
    * query-id dedup state keeps the state-store provider in the path.
    */
  /** The point-lookup tier ([[graft.jobs.IndexExport]]) measured
    * against the micro-batch serving floor: single BM25 queries and
    * single IVF-PQ queries served by partition-pruned reads of the
    * exported layout, NO streaming query, NO in-memory index. Each
    * lookup is timed individually (wall clock around the collect);
    * the probe also asserts hash-parity — the lookup's rows must equal
    * `bm25TopKIndexed` / `ivfAdcTopK` on the live data — so the
    * latency row can never describe a different answer. Export cost is
    * reported separately (it is the index build, paid once).
    */
  private def lookupLatency(spark: SparkSession, nDocs: Int,
      nLookups: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val docs = (0L until nDocs.toLong).map { i =>
      (i, Seq.fill(40 + rnd.nextInt(80))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")

    def pctRow(op: String, durs: Seq[Double], extra: String): Unit = {
      val d = durs.sorted
      def pct(p: Double): Double = d(math.round(p * (d.length - 1)).toInt)
      println(s"""{"probe":"point_lookup","op":"$op","n_lookups":${d.length},""" +
        s""""p50_ms":${f"${pct(0.5)}%.1f"},"p95_ms":${f"${pct(0.95)}%.1f"},""" +
        s""""max_ms":${f"${d.last}%.1f"},$extra}""")
    }

    // ---- BM25 ----
    val idx = graft.ext.Retrieval.bm25Index(docs)
    val out = java.nio.file.Files.createTempDirectory("lookup_bm25").toString
    val tExp0 = System.nanoTime()
    graft.jobs.IndexExport.exportBm25(idx, out)
    val exportSec = (System.nanoTime() - tExp0) / 1e9
    // parity: fixed query through both paths before releasing the index
    val parityTerms = Seq(vocab(3), vocab(77), vocab(150))
    val viaMem = graft.ext.Retrieval
      .bm25TopKIndexed(idx, Seq((0L, parityTerms)).toDF("query_id", "terms"), 10)
      .collect().map(_.toSeq).toSet
    graft.ext.Dedup.clearSignatureCaches(blocking = true)
    val viaDisk = graft.jobs.IndexExport
      .bm25Lookup(spark, out, Seq(0L -> parityTerms), 10)
      .collect().map(_.toSeq).toSet
    require(viaDisk == viaMem,
      s"lookup/batch divergence: ${viaDisk.size} vs ${viaMem.size} rows")
    // the dedicated single-query plan must land on the same (doc, score)s
    val viaSingle = graft.jobs.IndexExport
      .bm25LookupSingle(spark, out, parityTerms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    require(viaSingle == viaMem.map(s =>
        (s(2).asInstanceOf[Long], s(3).asInstanceOf[Double])),
      "single-lookup/batch divergence")
    // warm-up then measure: the batch-shaped lookup and the dedicated
    // single-query plan, same query stream
    (0 until 3).foreach { i =>
      graft.jobs.IndexExport.bm25Lookup(spark, out,
        Seq(i.toLong -> Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))), 10)
        .collect()
      graft.jobs.IndexExport.bm25LookupSingle(spark, out,
        Seq.fill(3)(vocab(rnd.nextInt(vocab.size))), 10).collect()
    }
    var rows = 0L
    val durs = (0 until nLookups).map { i =>
      val terms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
      val t0 = System.nanoTime()
      rows += graft.jobs.IndexExport
        .bm25Lookup(spark, out, Seq(i.toLong -> terms), 10).collect().length
      (System.nanoTime() - t0) / 1e6
    }
    pctRow("bm25_lookup_batchplan", durs,
      s""""n_docs":$nDocs,"export_sec":${f"$exportSec%.2f"},""" +
        s""""result_rows":$rows,"parity":true""")
    var rowsS = 0L
    val dursS = (0 until nLookups).map { _ =>
      val terms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
      val t0 = System.nanoTime()
      rowsS += graft.jobs.IndexExport
        .bm25LookupSingle(spark, out, terms, 10).collect().length
      (System.nanoTime() - t0) / 1e6
    }
    pctRow("bm25_lookup_single", dursS,
      s""""n_docs":$nDocs,"result_rows":$rowsS,"parity":true""")

    // ---- BM25 through the NO-SPARK local reader ----
    // parity first: the local rows must equal the Spark single-query
    // plan's rows exactly (ids, counts, scores to the bit)
    graft.jobs.LocalLookup.clearLayouts()
    val viaLocalParity = graft.jobs.LocalLookup
      .bm25Single(out, parityTerms, 10)
      .map(t => Seq[Any](t._1, t._2, t._3))
    // the Spark plan FORCED (cap −1): the default route is the local
    // tier, and local-vs-local would pin nothing
    val viaSingleRows = {
      val prev = graft.jobs.IndexExport.LocalLookupCap
      graft.jobs.IndexExport.LocalLookupCap = -1L
      try graft.jobs.IndexExport
        .bm25LookupSingle(spark, out, parityTerms, 10)
        .collect().map(_.toSeq).toSeq
      finally graft.jobs.IndexExport.LocalLookupCap = prev
    }
    require(viaLocalParity == viaSingleRows,
      s"local/spark lookup divergence:\n$viaLocalParity\nvs\n$viaSingleRows")
    (0 until 3).foreach { _ =>
      graft.jobs.LocalLookup.bm25Single(out,
        Seq.fill(3)(vocab(rnd.nextInt(vocab.size))), 10)
    }
    var rowsL = 0L
    val dursL = (0 until nLookups).map { _ =>
      val terms = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
      val t0 = System.nanoTime()
      rowsL += graft.jobs.LocalLookup.bm25Single(out, terms, 10).length
      (System.nanoTime() - t0) / 1e6
    }
    pctRow("bm25_lookup_local", dursL,
      s""""n_docs":$nDocs,"result_rows":$rowsL,"parity":true,""" +
        s""""export_dir":"$out"""")
    // NOTE: this row measures the local reader INSIDE the bench JVM,
    // which at this point carries the Spark phases' heap (GC pauses
    // stripe the tail). The deployment-shaped number comes from
    // `runMain graft.jobs.LocalLookupBench <export_dir> <n>` — a fresh
    // Spark-free JVM over the same export (SCALE.md records both).

    // ---- IVF-PQ ----
    val dims = 0 until 64
    val emb = spark.range(20000L).select($"id".as("vec_id"),
      array(dims.map(i =>
        (pmod($"id" * (i + 3), lit(257)) - 128).cast("float")): _*)
        .as("embedding"))
    val cbs = graft.ext.Pq.seedCodebooks(emb, m = 4, ksub = 16)
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val pqOut = java.nio.file.Files.createTempDirectory("lookup_pq").toString
    val tPq0 = System.nanoTime()
    graft.jobs.IndexExport.exportPqCells(emb, cents, cbs, pqOut)
    val pqExportSec = (System.nanoTime() - tPq0) / 1e9
    // query vectors fetched OUTSIDE the timed path (a server holds them)
    val qids = (0 until nLookups).map(i => (i * 37L + 5L) % 20000L)
    val qvecs = emb.filter($"vec_id".isin(qids.distinct: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val pqParity = graft.jobs.IndexExport
      .pqLookup(spark, pqOut, qvecs(qids.head), qids.head, 10, cbs, cents)
      .collect().map(_.toSeq).toSeq
    val pqLive = graft.ext.Pq.ivfAdcTopK(emb, qids.head, 10, cbs,
      centroids = Some(cents)).collect().map(_.toSeq).toSeq
    require(pqParity == pqLive, "pq lookup/live divergence")
    (0 until 3).foreach { i =>
      graft.jobs.IndexExport.pqLookup(spark, pqOut, qvecs(qids(i)),
        qids(i), 10, cbs, cents).collect()
    }
    var pqRows = 0L
    val pqDurs = qids.map { qid =>
      val t0 = System.nanoTime()
      pqRows += graft.jobs.IndexExport
        .pqLookup(spark, pqOut, qvecs(qid), qid, 10, cbs, cents)
        .collect().length
      (System.nanoTime() - t0) / 1e6
    }
    pctRow("ivf_pq_lookup", pqDurs,
      s""""n_vecs":20000,"export_sec":${f"$pqExportSec%.2f"},""" +
        s""""result_rows":$pqRows,"parity":true""")

    // ---- IVF-PQ through the NO-SPARK local reader ----
    graft.jobs.LocalLookup.clearLayouts()
    val pqLocalParity = graft.jobs.LocalLookup
      .pqSingle(pqOut, qvecs(qids.head), qids.head, 10, cbs, cents)
      .map(t => Seq[Any](t._1, t._2))
    require(pqLocalParity == pqLive.map(_.take(2)),
      s"local/live pq divergence:\n$pqLocalParity\nvs\n$pqLive")
    (0 until 3).foreach { i =>
      graft.jobs.LocalLookup.pqSingle(pqOut, qvecs(qids(i)), qids(i),
        10, cbs, cents)
    }
    var pqRowsL = 0L
    val pqDursL = qids.map { qid =>
      val t0 = System.nanoTime()
      pqRowsL += graft.jobs.LocalLookup
        .pqSingle(pqOut, qvecs(qid), qid, 10, cbs, cents).length
      (System.nanoTime() - t0) / 1e6
    }
    pctRow("ivf_pq_lookup_local", pqDursL,
      s""""n_vecs":20000,"result_rows":$pqRowsL,"parity":true""")
  }

  /** CONCURRENT point-lookup latency over the no-Spark local reader —
    * the probe the round-12 single-threaded p50s could not be: N
    * threads hammer [[graft.jobs.LocalLookup.bm25Single]] while a
    * re-export thread swaps the epoch pointer mid-run, so the
    * measurement covers (a) contention on the footer/layout caches
    * (lock-free hits + per-key computes after the Lru rewrite; the
    * round-12 global monitor serialized even hits, invisible at one
    * thread) and (b) the epoch pin protocol under live swaps. Every
    * result is parity-asserted against a single-threaded pre-run of
    * the same fixed query set — the latency rows can never describe a
    * different answer. Emits a single-thread baseline row and the
    * concurrent row (p50/p99 + the cross-thread ratio).
    */
  private def lookupConcurrency(spark: SparkSession, nDocs: Int,
      threads: Int, perThread: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val docs = (0L until nDocs.toLong).map { i =>
      (i, Seq.fill(40 + rnd.nextInt(80))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val idx = graft.ext.Retrieval.bm25Index(docs)
    val out = java.nio.file.Files.createTempDirectory("lookup_mt").toString
    graft.jobs.IndexExport.exportBm25(idx, out)
    graft.ext.Dedup.clearSignatureCaches(blocking = true)
    graft.jobs.LocalLookup.clearLayouts()

    // the fixed query set: 64 term-triples; expected answers computed
    // single-threaded up front (the corpus never changes, so every
    // epoch serves the identical answer — parity is exact)
    val qrnd = new scala.util.Random(11)
    val queries = Vector.fill(64)(Seq.fill(3)(vocab(qrnd.nextInt(vocab.size))))
    val expected = queries.map(q =>
      q -> graft.jobs.LocalLookup.bm25Single(out, q, 10)).toMap

    def pct(d: Seq[Double], p: Double): Double = {
      val s = d.sorted
      s(math.round(p * (s.length - 1)).toInt)
    }

    // single-thread baseline over the same stream length
    val baseDurs = (0 until perThread).map { i =>
      val q = queries(i % queries.size)
      val t0 = System.nanoTime()
      val r = graft.jobs.LocalLookup.bm25Single(out, q, 10)
      require(r == expected(q), "baseline parity violation")
      (System.nanoTime() - t0) / 1e6
    }
    println(s"""{"probe":"point_lookup_mt","op":"bm25_local_1thread",""" +
      s""""n_docs":$nDocs,"lookups":$perThread,""" +
      s""""p50_ms":${f"${pct(baseDurs, 0.5)}%.2f"},""" +
      s""""p99_ms":${f"${pct(baseDurs, 0.99)}%.2f"},""" +
      s""""max_ms":${f"${baseDurs.max}%.2f"},"parity":true}""")

    // concurrent run racing a re-exporter
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads + 1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var stopExports = false
    val exports = new AtomicLong
    val exporter = pool.submit[Unit] { () =>
      gate.await()
      while (!stopExports) {
        graft.jobs.IndexExport.exportBm25(idx, out)
        exports.incrementAndGet()
        Thread.sleep(200)
      }
    }
    val workers = (0 until threads).map { t =>
      pool.submit[Seq[Double]] { () =>
        gate.await()
        (0 until perThread).map { i =>
          val q = queries((i * (t + 3) + t) % queries.size)
          val t0 = System.nanoTime()
          val r = graft.jobs.LocalLookup.bm25Single(out, q, 10)
          require(r == expected(q),
            s"concurrent parity violation on thread $t lookup $i")
          (System.nanoTime() - t0) / 1e6
        }
      }
    }
    gate.countDown()
    val durs = workers.flatMap(_.get())
    stopExports = true
    exporter.get()
    pool.shutdown()
    graft.ext.Dedup.clearSignatureCaches(blocking = true)
    println(s"""{"probe":"point_lookup_mt","op":"bm25_local_mt",""" +
      s""""n_docs":$nDocs,"threads":$threads,"lookups":${durs.size},""" +
      s""""reexports_during_run":${exports.get()},""" +
      s""""p50_ms":${f"${pct(durs, 0.5)}%.2f"},""" +
      s""""p99_ms":${f"${pct(durs, 0.99)}%.2f"},""" +
      s""""max_ms":${f"${durs.max}%.2f"},""" +
      s""""p50_vs_1thread":${f"${pct(durs, 0.5) / pct(baseDurs, 0.5)}%.2f"},""" +
      s""""parity":true}""")
  }

  /** MIXED-TIER concurrency — the full serving surface under ONE load:
    * N threads alternate bm25 and IVF-PQ point lookups through the
    * no-Spark local reader while (a) a re-exporter swaps BOTH layouts'
    * epoch pointers mid-run and (b) a maintenance thread churns a
    * curation store (compaction + redaction cycles) in the same JVM.
    * The tiers share the footer/layout caches, the epoch pin protocol,
    * the Dfs seam and the heap — this probe exists to show none of it
    * bleeds: every lookup is parity-asserted against its
    * single-threaded pre-run, and the store's manifest view must be
    * bit-identical after the churn (compaction and redaction are
    * manifest-invariant by contract).
    */
  private def serveMixed(spark: SparkSession, nDocs: Int, threads: Int,
      perThread: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val docs = (0L until nDocs.toLong).map { i =>
      (i, Seq.fill(40 + rnd.nextInt(80))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val idx = graft.ext.Retrieval.bm25Index(docs)
    val bmOut = java.nio.file.Files.createTempDirectory("mixed_bm25").toString
    graft.jobs.IndexExport.exportBm25(idx, bmOut)

    val dims = 0 until 64
    val emb = spark.range(20000L).select($"id".as("vec_id"),
      array(dims.map(i =>
        (pmod($"id" * (i + 3), lit(257)) - 128).cast("float")): _*)
        .as("embedding"))
    val cbs = graft.ext.Pq.seedCodebooks(emb, m = 4, ksub = 16)
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val pqOut = java.nio.file.Files.createTempDirectory("mixed_pq").toString
    graft.jobs.IndexExport.exportPqCells(emb, cents, cbs, pqOut)

    val storeDir =
      java.nio.file.Files.createTempDirectory("mixed_store").toString
    val storeRows = spark.range(20000L).select($"id".as("doc_id"),
      lit("en").as("lang"), lit("web").as("source"), lit(64L).as("n_chars"),
      concat(lit("alpha beta gamma body "),
        ($"id" % 97L).cast("string")).as("text"),
      lit(8L).as("n_tok"), pmod($"id", lit(64L)).as("ingest_batch"))
    graft.streaming.CurationStream.appendStore(storeRows, storeDir,
      mode = "overwrite")
    val manifestBefore = graft.streaming.CurationStream
      .manifestView(graft.streaming.CurationStream.readStore(spark, storeDir))
      .collect().map(_.toSeq).toSet

    graft.ext.Dedup.clearSignatureCaches(blocking = true)
    graft.jobs.LocalLookup.clearLayouts()

    val qrnd = new scala.util.Random(11)
    val bmQueries = Vector.fill(64)(
      Seq.fill(3)(vocab(qrnd.nextInt(vocab.size))))
    val bmExpected = bmQueries.map(q =>
      q -> graft.jobs.LocalLookup.bm25Single(bmOut, q, 10)).toMap
    val qids = Vector.tabulate(64)(i => (i * 37L + 5L) % 20000L)
    val qvecs = emb.filter($"vec_id".isin(qids.distinct: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val pqExpected = qids.map(qid => qid ->
      graft.jobs.LocalLookup.pqSingle(pqOut, qvecs(qid), qid, 10,
        cbs, cents)).toMap

    def one(i: Int, t: Int): (String, Double) =
      if ((i + t) % 2 == 0) {
        val q = bmQueries((i * (t + 3) + t) % bmQueries.size)
        val t0 = System.nanoTime()
        val r = graft.jobs.LocalLookup.bm25Single(bmOut, q, 10)
        require(r == bmExpected(q), s"bm25 parity violation t$t i$i")
        ("bm25", (System.nanoTime() - t0) / 1e6)
      } else {
        val qid = qids((i * (t + 5) + t) % qids.size)
        val t0 = System.nanoTime()
        val r = graft.jobs.LocalLookup.pqSingle(pqOut, qvecs(qid), qid,
          10, cbs, cents)
        require(r == pqExpected(qid), s"pq parity violation t$t i$i")
        ("pq", (System.nanoTime() - t0) / 1e6)
      }

    def pct(d: Seq[Double], p: Double): Double = {
      val s = d.sorted
      s(math.round(p * (s.length - 1)).toInt)
    }
    def report(label: String, rows: Seq[(String, Double)],
        extra: String): Unit =
      Seq("bm25", "pq").foreach { op =>
        val d = rows.collect { case (`op`, ms) => ms }
        println(s"""{"probe":"serve_mixed","op":"${op}_$label",""" +
          s""""lookups":${d.size},"p50_ms":${f"${pct(d, 0.5)}%.2f"},""" +
          s""""p99_ms":${f"${pct(d, 0.99)}%.2f"},""" +
          s""""max_ms":${f"${d.max}%.2f"}$extra,"parity":true}""")
      }

    val base = (0 until perThread).map(i => one(i, 0))
    report("1thread", base, "")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads + 2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var stopAux = false
    val exports = new AtomicLong
    val maintCycles = new AtomicLong
    val exporter = pool.submit[Unit] { () =>
      gate.await()
      while (!stopAux) {
        graft.jobs.IndexExport.exportBm25(idx, bmOut)
        graft.jobs.IndexExport.exportPqCells(emb, cents, cbs, pqOut)
        exports.incrementAndGet()
        Thread.sleep(200)
      }
    }
    // compliance churn: each cycle compacts, then redacts 3 fresh ids
    // (redaction is manifest-INVARIANT — offsets ride the frozen n_tok)
    val redactCursor = new AtomicLong(0L)
    val maintainer = pool.submit[Unit] { () =>
      gate.await()
      while (!stopAux) {
        graft.streaming.CurationStream.compactStore(spark, storeDir,
          targetFiles = 2)
        val from = redactCursor.getAndAdd(3L)
        graft.streaming.CurationStream.redactStore(spark, storeDir,
          Seq(from, from + 1L, from + 2L))
        maintCycles.incrementAndGet()
        ()
      }
    }
    val workers = (0 until threads).map { t =>
      pool.submit[Seq[(String, Double)]] { () =>
        gate.await()
        (0 until perThread).map(i => one(i, t))
      }
    }
    gate.countDown()
    val durs = workers.flatMap(_.get())
    stopAux = true
    exporter.get(); maintainer.get()
    pool.shutdown()
    val bmBase = base.collect { case ("bm25", ms) => ms }
    val bmMt = durs.collect { case ("bm25", ms) => ms }
    report("mt", durs,
      s""","threads":$threads,"reexports":${exports.get()},""" +
        s""""maintenance_cycles":${maintCycles.get()},""" +
        s""""p50_vs_1thread":${f"${pct(bmMt, 0.5) / pct(bmBase, 0.5)}%.2f"}""")
    val manifestAfter = graft.streaming.CurationStream
      .manifestView(graft.streaming.CurationStream.readStore(spark, storeDir))
      .collect().map(_.toSeq).toSet
    require(manifestAfter == manifestBefore,
      "maintenance churn under serving load moved the manifest")
    println(s"""{"probe":"serve_mixed","op":"manifest_parity",""" +
      s""""cycles":${maintCycles.get()},"parity":true}""")
    graft.ext.Dedup.clearSignatureCaches(blocking = true)
  }

  private def serveLatency(spark: SparkSession, qps: Int, seconds: Int,
      nDocs: Int, provider: Option[String]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provName = setProvider(spark, provider)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (seconds * 8 + 100).toString)
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val docs = (0L until nDocs.toLong).map { i =>
      (i, Seq.fill(40 + rnd.nextInt(80))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val idx = graft.ext.Retrieval.bm25Index(docs)
    val mem = MemoryStream[(Long, Seq[String], java.sql.Timestamp)]
    val served = new AtomicLong
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"serve_bench_$provName").toString
    val base = 1673222400000L
    val q = StreamOps.retrievalServeStream(
      mem.toDF().toDF("query_id", "terms", "ts"), "ts", "30 seconds", ckpt,
      b => graft.ext.Retrieval.bm25TopKIndexed(idx, b, 10)) { (res, _) =>
        served.addAndGet(res.count()); ()
      }
    @volatile var stop = false
    val feeder = new Thread(() => {
      var emitted = 0L
      val t0 = System.nanoTime()
      while (!stop) {
        val owed = ((System.nanoTime() - t0) / 1e9 * qps).toLong
        if (owed > emitted) {
          val rows = (emitted until owed).map { j =>
            (j, Seq.fill(3)(vocab(rnd.nextInt(vocab.size))),
              new java.sql.Timestamp(base + j * 10))
          }
          mem.addData(rows)
          emitted = owed
        }
        Thread.sleep(50)
      }
    }, "serve-feeder")
    feeder.setDaemon(true)
    try {
      feeder.start()
      Thread.sleep(seconds * 1000L)
      stop = true
      feeder.join()
      q.processAllAvailable()
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val durs = prog.map(_.durationMs.get("triggerExecution").toLong).sorted
      require(durs.nonEmpty, "no non-empty batches in serve run")
      def pct(p: Double): Long = durs(math.round(p * (durs.length - 1)).toInt)
      val qPerBatch = prog.map(_.numInputRows).sum.toDouble / prog.length
      println(s"""{"probe":"serve_latency","op":"bm25_serve","provider":"$provName",""" +
        s""""qps":$qps,"seconds":$seconds,"n_docs":$nDocs,""" +
        s""""batches":${durs.length},"queries_per_batch":${f"$qPerBatch%.1f"},""" +
        s""""p50_ms":${pct(0.5)},"p95_ms":${pct(0.95)},"max_ms":${durs.last},""" +
        s""""result_rows":${served.get()},""" +
        s""""provider_engaged":${providerEngaged(provider, ckpt)}}""")
    } finally {
      stop = true
      q.stop()
      graft.ext.Dedup.clearSignatureCaches(blocking = true)
    }
  }

  /** The ANN half of the serving matrix: trained IVF index over a
    * clustered fixture, PERSISTED as the cell-partitioned disk store
    * ([[graft.ext.Similarity.ivfAppendStore]] — the layout incremental
    * ingest maintains), query vectors paced at `qps` through
    * [[StreamOps.retrievalServeStream]] →
    * [[graft.ext.Similarity.ivfBatchTopKQueries]]. Same measurement
    * discipline as the BM25 probe: index/train cost outside the path,
    * per-batch `triggerExecution` percentiles, both providers.
    */
  private def serveAnnLatency(spark: SparkSession, qps: Int, seconds: Int,
      nVecs: Int, provider: Option[String], pq: Boolean = false): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provName = setProvider(spark, provider)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (seconds * 8 + 100).toString)
    val all = graft.RecallProbe.clusteredFixture(spark, nVecs).cache()
    val cents = graft.ext.Similarity
      .kmeansCentroids(all, k = 16, iters = 3, roundTo = 4)
    // pq=false: the float-vector cell store (ivfAppendStore) served by
    // in-plan cosine re-ranking; pq=true: the CODES store
    // (IndexExport.exportPqCells — m longs/vec, no float reads) served
    // by batch ADC. Same probe discipline, same stream topology — the
    // row pair isolates what the memory tier buys per batch.
    val cbs = if (pq) Some(graft.ext.Pq.seedCodebooks(all, m = 4, ksub = 16))
      else None
    val dir = java.nio.file.Files
      .createTempDirectory(s"serve_ann_store_$provName").toString
    val store = if (pq) {
      graft.jobs.IndexExport.exportPqCells(all, cents, cbs.get, dir)
      spark.read
        .parquet(s"${graft.jobs.IndexExport.resolveEpoch(dir)}/codes")
        .cache()
    } else {
      graft.ext.Similarity.ivfAppendStore(all, cents, dir)
      spark.read.parquet(dir).cache()
    }
    store.count() // materialize: store read cost off the serving path
    val qvecs = all.filter($"vec_id" < 256)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1)
    all.unpersist()
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val served = new AtomicLong
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"serve_ann_ckpt_$provName").toString
    val base = 1673222400000L
    val serveFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (pq) b => graft.ext.Pq.ivfAdcBatchTopK(store, cents, cbs.get,
        b.select(col("query_id"), col("qvec")), k = 10, nprobe = 2)
      else b => graft.ext.Similarity.ivfBatchTopKQueries(store, cents.sortBy(_._1),
        b.select(col("query_id"), col("qvec")), k = 10, nprobe = 2)
    val q = StreamOps.retrievalServeStream(
      mem.toDF().toDF("query_id", "qvec", "ts"), "ts", "30 seconds", ckpt,
      serveFn) { (res, _) => served.addAndGet(res.count()); () }
    @volatile var stop = false
    val feeder = new Thread(() => {
      var emitted = 0L
      val t0 = System.nanoTime()
      while (!stop) {
        val owed = ((System.nanoTime() - t0) / 1e9 * qps).toLong
        if (owed > emitted) {
          val rows = (emitted until owed).map { j =>
            val (_, v) = qvecs((j % qvecs.length).toInt)
            (j, v, new java.sql.Timestamp(base + j * 10))
          }
          mem.addData(rows)
          emitted = owed
        }
        Thread.sleep(50)
      }
    }, "serve-ann-feeder")
    feeder.setDaemon(true)
    try {
      feeder.start()
      Thread.sleep(seconds * 1000L)
      stop = true
      feeder.join()
      q.processAllAvailable()
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val durs = prog.map(_.durationMs.get("triggerExecution").toLong).sorted
      require(durs.nonEmpty, "no non-empty batches in serve-ann run")
      def pct(p: Double): Long = durs(math.round(p * (durs.length - 1)).toInt)
      val qPerBatch = prog.map(_.numInputRows).sum.toDouble / prog.length
      val opName = if (pq) "ivf_pq_serve" else "ivf_serve"
      println(s"""{"probe":"serve_latency","op":"$opName","provider":"$provName",""" +
        s""""qps":$qps,"seconds":$seconds,"n_vecs":$nVecs,""" +
        s""""batches":${durs.length},"queries_per_batch":${f"$qPerBatch%.1f"},""" +
        s""""p50_ms":${pct(0.5)},"p95_ms":${pct(0.95)},"max_ms":${durs.last},""" +
        s""""result_rows":${served.get()},""" +
        s""""provider_engaged":${providerEngaged(provider, ckpt)}}""")
    } finally {
      stop = true
      q.stop()
      store.unpersist()
    }
  }

  /** Apply (or clear) the state-store provider conf; returns the label. */
  private def setProvider(spark: SparkSession, provider: Option[String]): String = {
    provider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    provider.map(_ => "rocksdb").getOrElse("default")
  }

  /** RocksDB engagement guard (same checkpoint-artifact contract as the
    * RocksDB specs): a conf typo must not silently re-bench the default
    * store.
    */
  private def providerEngaged(provider: Option[String], ckpt: String): Boolean =
    provider.isEmpty || {
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).iterator.flatten.flatMap(walk)
        else Iterator(f)
      walk(new java.io.File(ckpt, "state")).exists(f =>
        f.getName.endsWith(".zip") || f.getName.endsWith(".changelog"))
    }

  private def report(op: String, provider: String, rows: Long, sec: Double,
                     batches: Int, extra: String = ""): Unit =
    println(s"""{"probe":"stream_throughput","op":"$op","provider":"$provider",""" +
      f""""rows":$rows,"sec":$sec%.2f,"rows_per_sec":${(rows / sec).toLong},""" +
      s""""batches":$batches$extra}""")

  /** TCP server → NmeaSocket source → reassembly → decode → fan-out.
    * Reassembly's flatMapGroupsWithState is the unbounded-key state at
    * ingest scale, so the wire is measured on BOTH providers.
    */
  private def liveWire(spark: SparkSession, n: Int,
                       provider: Option[String]): Unit = {
    import spark.implicits._
    val provName = setProvider(spark, provider)
    val lines = graft.ais.Synth.datalogLines(n)
    val server = new ServerSocket(0)
    @volatile var served = false
    val serverThread = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
        lines.foreach { l => out.write(l.getBytes("UTF-8")); out.write('\n') }
        out.flush()
        served = true
        // keep the socket open: EOF would trigger the client's reconnect
        while (!Thread.interrupted()) Thread.sleep(50)
      } catch { case _: Throwable => () }
    }, "stream-bench-nmea-server")
    serverThread.setDaemon(true)
    serverThread.start()

    val hub = new FanoutHub(queueCapacity = 1 << 16)
    val received = new AtomicLong
    hub.register("counter", new FanoutHub.Transport {
      override def send(msg: String): Unit = { received.incrementAndGet(); () }
    })
    val raw = graft.sources.Sources.tcpLines(spark, "127.0.0.1", server.getLocalPort)
    val decoded = Reassembly
      .assembleStream(Reassembly.parseFragments(raw).as[Reassembly.Fragment]).toDF()
      .withColumn("d", graft.ais.AisDecoder.ais_decode(col("sentences")))
      .filter(col("d").isNotNull)
      .select(col("d.mmsi").as("mmsi"), col("d.position.latitude").as("lat"),
        col("d.position.longitude").as("lon"))
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"sb_live_$provName").toString
    val t0 = System.nanoTime()
    val q = FanoutSink.start(decoded, hub, s"stream_bench_live_$provName",
      checkpointLocation = Some(ckpt))
    try {
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (received.get() < n && System.nanoTime() < deadline) {
        q.processAllAvailable()
        if (received.get() < n) Thread.sleep(100)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      report("live_wire_nmea_reassembly_decode_fanout", provName,
        received.get(), sec, batches,
        s""","expected":$n,"served":$served,""" +
          s""""provider_engaged":${providerEngaged(provider, ckpt)}""")
    } finally {
      q.stop(); serverThread.interrupt(); server.close(); hub.shutdown()
    }
  }

  /** The stateful family at nState rows in ~20 burst micro-batches. */
  private def statefulFamily(spark: SparkSession, n: Int,
                             provider: Option[String]): Unit = {
    val provName = setProvider(spark, provider)
    val chunks = 20
    val base = 1673222400000L

    /** Drive a MemoryStream query chunk-by-chunk; return (sec, batches, out). */
    def drive[T](mem: MemoryStream[T], data: IndexedSeq[T],
                 q: org.apache.spark.sql.streaming.StreamingQuery): (Double, Int) = {
      val t0 = System.nanoTime()
      data.grouped(math.max(1, data.size / chunks)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      ((System.nanoTime() - t0) / 1e9, q.recentProgress.count(_.numInputRows > 0))
    }

    def bench[T](op: String, mem: MemoryStream[T], data: IndexedSeq[T],
                 build: Dataset[T] => org.apache.spark.sql.Dataset[_]): Unit = {
      val outCount = new AtomicLong
      val ckpt = java.nio.file.Files.createTempDirectory(s"sb_${op}_$provName").toString
      val q = build(mem.toDS()).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[_], _: Long) => outCount.addAndGet(b.count()); () }
        .start()
      try {
        val (sec, batches) = drive(mem, data, q)
        report(op, provName, n, sec, batches,
          s""","out_rows":${outCount.get()},""" +
            s""""provider_engaged":${providerEngaged(provider, ckpt)}""")
      } finally q.stop()
    }

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 1. windowed counts: 10k keys, 1-min windows, rows 20ms apart in
    // event time so the watermark closes ~170 windows over the run
    val evs = (0 until n).map { i =>
      (new java.sql.Timestamp(base + i.toLong * 20), (i % 10000).toLong)
    }
    bench[(java.sql.Timestamp, Long)]("windowed_counts",
      MemoryStream[(java.sql.Timestamp, Long)], evs,
      ds => StreamOps.windowedCounts(ds.toDF("ts", "key"), "ts", "key",
        "1 minute", "30 seconds"))

    // 2. watermark dedup: every 5th row duplicates its predecessor's id
    // inside the horizon, so ~20% of rows hit an existing state entry
    val dups = (0 until n).map { i =>
      val id = if (i % 5 == 0 && i > 0) (i - 1).toLong else i.toLong
      (new java.sql.Timestamp(base + i.toLong * 20), id)
    }
    bench[(java.sql.Timestamp, Long)]("dedup_within_watermark",
      MemoryStream[(java.sql.Timestamp, Long)], dups,
      ds => StreamOps.dedupWithinWatermark(ds.toDF("ts", "id"), "ts",
        Seq("id"), "30 seconds"))

    // 3. token-budget quota: flatMapGroupsWithState over 5 language
    // groups — the shuffle+sort+state path with tiny state (5 longs)
    val docs = (0 until n).map { i =>
      (s"l${i % 5}", i.toLong, 100L)
    }
    bench[(String, Long, Long)]("token_budget_fmgws",
      MemoryStream[(String, Long, Long)], docs,
      ds => StreamOps.tokenBudgetStream(ds, budget = Long.MaxValue / 4))
  }
}
