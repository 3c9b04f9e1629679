package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Pq, Retrieval, Similarity}

/** The point-lookup serving tier: the exported bucketed/sorted layout
  * must (a) serve results hash-identical to the in-memory index paths,
  * and (b) actually PRUNE — the lookup's scans must carry a partition
  * filter on the bucket/cell directory column and read strictly fewer
  * partition directories than exist, or the "point lookup" is a full
  * index scan wearing a trench coat.
  */
class IndexExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  private def docsFixture = {
    import spark.implicits._
    // 40 docs over a 12-term vocabulary, several terms per doc,
    // repetition included (tf > 1 paths)
    (0 until 40).map { i =>
      val toks = Seq("spark", "table", "hash", "scan", "join", "sort",
        "row", "col", "disk", "ram", "net", "cpu")
      val text = (0 until 6).map(j => toks((i * 5 + j * 7) % toks.size))
        .mkString(" ") + (if (i % 3 == 0) " spark spark" else "")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("bm25 lookup over the export equals the in-memory indexed serving") {
    import spark.implicits._
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_export").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)

    val queries = Seq(7L -> Seq("spark", "hash"), 9L -> Seq("scan"))
    val viaMemory = Retrieval
      .bm25TopKIndexed(idx, queries.toDF("query_id", "terms"), 5)
      .collect().map(_.toSeq).toSet
    graft.ext.Dedup.clearSignatureCaches()

    // single-query point lookups, unioned — each pays only its own
    // buckets. The default route is the driver-local tier; assert BOTH
    // routes against the independent in-memory serving.
    val viaLookup = queries.map { case (qid, terms) =>
      IndexExport.bm25Lookup(spark, out, Seq(qid -> terms), 5)
        .collect().map(_.toSeq).toSet
    }.reduce(_ ++ _)
    assert(viaLookup === viaMemory)
    assert(viaLookup.nonEmpty)
    val viaDistributed = {
      val prev = IndexExport.LocalLookupCap
      IndexExport.LocalLookupCap = -1L
      try queries.map { case (qid, terms) =>
        IndexExport.bm25Lookup(spark, out, Seq(qid -> terms), 5)
          .collect().map(_.toSeq).toSet
      }.reduce(_ ++ _)
      finally IndexExport.LocalLookupCap = prev
    }
    assert(viaDistributed === viaMemory)
  }

  test("single-query lookup plan equals the indexed serving scores") {
    import spark.implicits._
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_export_single").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    IndexExport.clearReaders()
    val terms = Seq("spark", "hash", "cpu")
    val viaMem = Retrieval
      .bm25TopKIndexed(idx, Seq((0L, terms)).toDF("query_id", "terms"), 7)
      .select($"doc_id", $"score").collect().map(_.toSeq).toSet
    graft.ext.Dedup.clearSignatureCaches()
    val viaSingle = IndexExport.bm25LookupSingle(spark, out, terms, 7)
      .select($"doc_id", $"score").collect().map(_.toSeq).toSet
    assert(viaSingle === viaMem)
    assert(viaSingle.nonEmpty)
    // the DISTRIBUTED fast plan (forced; the default route above is the
    // local tier): exactly ONE shuffle below the top-k
    val prev = IndexExport.LocalLookupCap
    IndexExport.LocalLookupCap = -1L
    try {
      val df = IndexExport.bm25LookupSingle(spark, out, terms, 7)
      df.collect()
      assert(df.collect().map(_.toSeq).toSet
        .map((s: Seq[Any]) => Seq(s(0), s(2))) === viaMem)
      val c = graft.PlanShape.count(df.queryExecution.executedPlan)
      assert(c.cartesians === 0)
    } finally IndexExport.LocalLookupCap = prev
  }

  test("bm25 lookup prunes to the query's buckets and pushes the term filter") {
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_export_prune").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    graft.ext.Dedup.clearSignatureCaches()

    // force the distributed plan: this test pins ITS scan shape (the
    // default route is the driver-local tier and plans no file scan)
    val prevCap = IndexExport.LocalLookupCap
    IndexExport.LocalLookupCap = -1L
    val df =
      try IndexExport.bm25Lookup(spark, out, Seq(1L -> Seq("spark")), 5)
      finally IndexExport.LocalLookupCap = prevCap
    df.collect()
    val scans = graft.PlanShape.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    scans.foreach { f =>
      val s = f.toString
      assert(s.contains("PartitionFilters") && s.contains("bucket"),
        s"scan must carry a bucket partition filter:\n$s")
      // a one-term IN folds to EqualTo before pushdown
      assert(s.contains("PushedFilters") &&
        (s.contains("In(term") || s.contains("EqualTo(term")),
        s"term filter must reach the parquet reader:\n$s")
      // one term -> exactly one of the 16 bucket directories is read
      assert(f.relation.partitionSchema.fieldNames.contains("bucket"))
      assert(f.selectedPartitions.partitionCount === 1,
        s"one-term lookup must read 1 bucket dir, got " +
          s"${f.selectedPartitions.partitionCount}")
    }
  }

  test("re-export during a lookup loop never yields a mixed-epoch or missing-file read") {
    import spark.implicits._
    val docsA = docsFixture
    // corpus B: different content under the same terms, so the answers
    // are distinguishable (every doc gains an extra "spark hash" tail
    // and ids shift) — a mixed-epoch read could not equal either answer
    val docsB = docsFixture.select(($"doc_id" + 1000L).as("doc_id"),
      concat($"text", lit(" spark hash")).as("text"))
    val idxA = Retrieval.bm25Index(docsA)
    val idxB = Retrieval.bm25Index(docsB)
    val terms = Seq("spark", "hash")
    // forced distributed: this test pins the SPARK reader-cache epoch
    // protocol (the local tier's twin lives in LocalLookupSpec)
    def answer(dir: String): Set[Seq[Any]] = {
      val prev = IndexExport.LocalLookupCap
      IndexExport.LocalLookupCap = -1L
      try IndexExport.bm25LookupSingle(spark, dir, terms, 5)
        .collect().map(_.toSeq).toSet
      finally IndexExport.LocalLookupCap = prev
    }

    // expected answers from two INDEPENDENT layouts
    val refA = Files.createTempDirectory("bm25_epoch_refA").toString
    val refB = Files.createTempDirectory("bm25_epoch_refB").toString
    IndexExport.exportBm25(idxA, refA, nBuckets = 16)
    IndexExport.exportBm25(idxB, refB, nBuckets = 16)
    val expectA = answer(refA)
    val expectB = answer(refB)
    assert(expectA !== expectB)

    // the measured loop: re-export B over the SAME root mid-loop, with
    // NO clearReaders() anywhere — the epoch pointer + retained
    // previous epoch must make every read a consistent full answer
    val out = Files.createTempDirectory("bm25_epoch_swap").toString
    IndexExport.exportBm25(idxA, out, nBuckets = 16)
    var seenB = false
    (0 until 8).foreach { i =>
      if (i == 4) IndexExport.exportBm25(idxB, out, nBuckets = 16)
      val r = answer(out)
      assert(r === expectA || r === expectB,
        s"mixed-epoch or partial read at lookup $i")
      if (r === expectB) seenB = true
    }
    assert(seenB, "the re-export never became visible through the pointer")
    // pruning kept the root bounded: at most KeepEpochs epoch dirs
    val epochs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch_"))
    assert(epochs.length <= IndexExport.KeepEpochs)
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("a pinned epoch survives any number of re-exports, then prunes on release") {
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_epoch_pin").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    val pinnedDir = IndexExport.withPinnedEpoch(out) { dir =>
      // the artificially slow lookup: THREE full export+prune cycles
      // land while the epoch is held — without the pin, KeepEpochs=2
      // deletes `dir` on the second one (the round-12 retention hole)
      (0 until 3).foreach(_ => IndexExport.exportBm25(idx, out, nBuckets = 16))
      assert(Dfs.isDirectory(new org.apache.hadoop.fs.Path(dir)),
        "pinned epoch was pruned")
      // and its FILES are intact: the in-flight reader finishes its
      // lookup against exactly this epoch
      val viaLocal = LocalLookup.bm25Single(dir, Seq("spark", "hash"), 5)
      assert(viaLocal.nonEmpty)
      dir
    }
    // pin released: the next export's prune collects the old epoch
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    assert(!Dfs.exists(new org.apache.hadoop.fs.Path(pinnedDir)),
      "released out-of-window epoch must be pruned by the next export")
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("a lookup against a missing layout fails fast, never spins on the pin") {
    val dir = new java.io.File(
      Files.createTempDirectory("bm25_missing").toFile, "never_exported")
    val e = intercept[IllegalArgumentException] {
      LocalLookup.bm25Single(dir.toString, Seq("spark"), 5)
    }
    assert(e.getMessage.contains("no meta file"),
      s"missing layout must surface the reader's error, got: ${e.getMessage}")
  }

  test("prune-vs-pin race: a reader pinning inside the prune window re-resolves, never a vanishing epoch") {
    import org.apache.hadoop.fs.Path
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = java.nio.file.Files.createTempDirectory("bm25_condemn").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    val epoch1 = IndexExport.resolveEpoch(out)

    // force the exact ADVICE interleaving: the reader RESOLVES the
    // epoch, then the pruner passes its pin check (no pin yet) and
    // commits to deleting it, and only THEN does the reader pin — the
    // condemned-set handshake must push the reader onto a live epoch
    val resolved = new java.util.concurrent.CountDownLatch(1)
    val mayPin = new java.util.concurrent.CountDownLatch(1)
    @volatile var servedDir: String = null
    @volatile var servedExisted = false
    IndexExport.pinPauseHook = dir => if (dir == epoch1) {
      IndexExport.pinPauseHook = _ => ()
      resolved.countDown()
      mayPin.await()
    }
    try {
      val reader = new Thread(() => {
        IndexExport.withPinnedEpoch(out) { dir =>
          servedDir = dir
          servedExisted = Dfs.exists(new Path(dir))
        }
        ()
      })
      reader.start()
      resolved.await()
      IndexExport.prunePauseHook = dir => if (dir == epoch1) {
        IndexExport.prunePauseHook = _ => ()
        mayPin.countDown() // the reader pins NOW, mid-prune
        Thread.sleep(100)  // let the pin land inside the delete window
      }
      // two more exports: the second one's prune condemns + deletes
      // epoch_1 (KeepEpochs = 2), with the reader racing it
      IndexExport.exportBm25(idx, out, nBuckets = 16)
      IndexExport.exportBm25(idx, out, nBuckets = 16)
      reader.join(30000)
      assert(!reader.isAlive, "reader never finished — pin/prune deadlock")
      assert(servedDir != null && servedDir != epoch1,
        "reader must re-resolve off the condemned epoch")
      assert(servedExisted, "reader served from a deleted directory")
      assert(!Dfs.exists(new Path(epoch1)), "condemned epoch must be gone")
    } finally {
      IndexExport.pinPauseHook = _ => ()
      IndexExport.prunePauseHook = _ => ()
    }
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("epoch paths are canonical: a relative root spelling pins the same key the pruner consults") {
    import org.apache.hadoop.fs.Path
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val abs = java.nio.file.Files.createTempDirectory("bm25_canon").toString
    IndexExport.exportBm25(idx, abs, nBuckets = 16)
    // a dot-segmented spelling of the same root must resolve to the
    // SAME canonical epoch string (the pin/prune keyspace)
    val parent = new java.io.File(abs).getParentFile.getName
    val dotted = new java.io.File(abs).getParent +
      java.io.File.separator + "." + java.io.File.separator +
      new java.io.File(abs).getName
    assert(IndexExport.resolveEpoch(dotted) === IndexExport.resolveEpoch(abs),
      s"dotted spelling split the epoch keyspace (parent $parent)")
    graft.ext.Dedup.clearSignatureCaches()
  }

  test("pq lookup over exported cells equals ivfAdcTopK on the live table") {
    import spark.implicits._
    val dims = 0 until 32
    val emb = spark.range(200).select($"id".as("vec_id"),
      array(dims.map(i =>
        (pmod($"id" * (i + 3), lit(23)) - 11).cast("float")): _*)
        .as("embedding"))
    val cbs = Pq.seedCodebooks(emb, m = 4, ksub = 16)
    val cents = emb.filter($"vec_id" < 16)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val out = Files.createTempDirectory("pq_export").toString
    IndexExport.exportPqCells(emb, cents, cbs, out)

    val qvec = emb.filter($"vec_id" === 0L).select($"embedding")
      .collect().head.getSeq[Float](0)
    val viaLookup = IndexExport
      .pqLookup(spark, out, qvec, queryVecId = 0L, k = 10, cbs, cents)
      .collect().map(_.toSeq).toSeq
    val viaLive = Pq.ivfAdcTopK(emb, queryVecId = 0L, k = 10, cbs,
      centroids = Some(cents))
      .collect().map(_.toSeq).toSeq
    assert(viaLookup === viaLive)
    assert(viaLookup.nonEmpty)

    // and the scan is cell-pruned: nprobe=2 of 16 cell directories
    val df = IndexExport.pqLookup(spark, out, qvec, 0L, 10, cbs, cents)
    df.collect()
    val scans = graft.PlanShape.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.toString.contains("PartitionFilters") &&
        f.toString.contains("cell"),
        s"codes scan must carry a cell partition filter:\n$f")
      assert(f.selectedPartitions.partitionCount <= 2,
        s"nprobe=2 lookup must read <=2 cell dirs, got " +
          s"${f.selectedPartitions.partitionCount}")
    }
  }

  test("a poisoned write aborts the export fail-fast: error propagated, no pointer move, siblings cancelled") {
    import spark.implicits._
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_poison").toString
    // a healthy first export, so the pointer exists and MUST NOT move
    IndexExport.exportBm25(idx, out, nBuckets = 8)
    graft.ext.Dedup.clearSignatureCaches()
    val pointerBefore = IndexExport.resolveEpoch(out)

    // poison the POSTINGS side (throws on evaluation) and make the df
    // side SLOW (sleeps per row): without fail-fast cancellation the
    // doomed df job runs its full ~40 s to completion after the
    // postings failure; with it the export returns in a few seconds
    val poison = udf((id: Long) => {
      if (id >= 0L) throw new RuntimeException("poisoned postings write")
      id
    })
    val slow = udf((id: Long) => { Thread.sleep(1000L); id })
    val poisonedIdx = Retrieval.Bm25Index(
      idx.postings.withColumn("doc_id", poison($"doc_id")),
      idx.dfTable.withColumn("df", slow($"df")), idx.n, idx.sumDl)
    val t0 = System.nanoTime()
    val e = intercept[Throwable] {
      IndexExport.exportBm25(poisonedIdx, out, nBuckets = 8)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // the ROOT failure surfaces (not a sibling's "job cancelled")
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(causes(e).exists(_.contains("poisoned postings write")),
      s"expected the poison to propagate, got: $e")
    // the pointer never moved — readers keep serving the healthy epoch
    assert(IndexExport.resolveEpoch(out) === pointerBefore)
    // the slow sibling was CANCELLED, not run to completion: the df
    // table has ~12 rows x 1 s/row through a 4-core pool; anything
    // close to that budget means the doomed job survived the failure
    assert(sec < 20.0,
      f"export took $sec%.1f s — the slow df write ran to completion " +
        "instead of being cancelled")
    graft.ext.Dedup.clearSignatureCaches()
  }
}
