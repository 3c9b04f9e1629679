package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Pq, Retrieval}

/** The no-Spark point-lookup reader ([[LocalLookup]]) must return rows
  * identical to the Spark lookup plans over the same export — same
  * matches, same scores to the bit, same order — and must do it with
  * ZERO Spark jobs (that is the tier's reason to exist: point traffic
  * never pays cluster scheduling). Spark is used here only to build
  * the fixture/export and to compute the expected answers.
  */
class LocalLookupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    org.apache.spark.sql.graft.GraftExtensions.install(s)
    s
  }

  private val vocab = Seq("spark", "table", "hash", "scan", "join",
    "sort", "row", "col", "disk", "ram", "net", "cpu")

  private def docsFixture = {
    import spark.implicits._
    // repetition (tf > 1), a NULL text and a NULL doc_id: the batch
    // plan scores both (dl 0 never matches; the null-id doc groups),
    // so the local twin must too
    val rows = (0 until 40).map { i =>
      val text = (0 until 6).map(j => vocab((i * 5 + j * 7) % vocab.size))
        .mkString(" ") + (if (i % 3 == 0) " spark spark" else "")
      (Option(i.toLong), Option(text))
    } ++ Seq((Option(99L), Option.empty[String]),
      (Option.empty[Long], Option("spark hash hash")))
    rows.toDF("doc_id", "text")
  }

  /** Spark jobs visible to the status tracker, flushed until stable so
    * an async listener event from fixture-building cannot leak into the
    * measured window.
    */
  private def stableJobCount(): Int = {
    def c() = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    var prev = -1
    var cur = c()
    while (cur != prev) { Thread.sleep(100); prev = cur; cur = c() }
    cur
  }

  /** Run `f` with the lookup query paths FORCED onto the distributed
    * plans (cap −1 declines even a zero-match query): the expected side
    * of every parity test must be the Spark plan, not the local tier
    * the routing would otherwise serve it from.
    */
  private def forceDistributed[T](f: => T): T = {
    val prev = IndexExport.LocalLookupCap
    IndexExport.LocalLookupCap = -1L
    try f finally IndexExport.LocalLookupCap = prev
  }

  test("local bm25 lookup equals the Spark single-query plan, with zero Spark jobs") {
    import spark.implicits._
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_local").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    graft.ext.Dedup.clearSignatureCaches()
    IndexExport.clearReaders()
    LocalLookup.clearLayouts()

    val queries: Seq[Seq[String]] =
      vocab.map(Seq(_)) ++ // every term alone (every bucket path)
        Seq(Seq("spark", "hash", "cpu"), Seq("scan", "scan", "join"),
          Seq("absent_term"), Seq("spark", "absent_term"),
          Seq(null, "disk"), Seq("net", "ram", "row", "col"))
    val expected = forceDistributed(queries.map { terms =>
      IndexExport.bm25LookupSingle(spark, out, terms, 7)
        .collect().map(r => (
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
          r.getLong(1), r.getDouble(2))).toSeq
    })

    val before = stableJobCount()
    val got = queries.map(LocalLookup.bm25Single(out, _, 7))
    val after = stableJobCount()
    assert(after === before, "local lookup must run zero Spark jobs")
    queries.lazyZip(expected).lazyZip(got).foreach { (terms, exp, act) =>
      assert(act === exp, s"divergence for terms=$terms")
    }
    assert(expected.count(_.nonEmpty) > queries.size / 2)
    // the null-id doc ("spark hash hash", high tf/dl) must surface in
    // at least one query's top-k through both paths (got === expected
    // above already pinned the local path to it)
    assert(expected.exists(_.exists(_._1 == null)))
  }

  test("local bm25 lookup is thread-safe under concurrent serving load") {
    import spark.implicits._
    // a serving tier takes parallel queries: hammer the shared caches
    // (layout, footers, per-bucket df maps) from many threads on a COLD
    // reader and require every answer to equal the single-threaded one
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_local_mt").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    graft.ext.Dedup.clearSignatureCaches()
    LocalLookup.clearLayouts()

    val queries = (0 until 40).map(i =>
      Seq(vocab(i % vocab.size), vocab((i * 5 + 1) % vocab.size)))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = queries.map(terms =>
      Future(terms -> LocalLookup.bm25Single(out, terms, 7)))
    val got = Await.result(Future.sequence(futures), 60.seconds).toMap
    queries.distinct.foreach { terms =>
      assert(got(terms) === LocalLookup.bm25Single(out, terms, 7),
        s"concurrent result diverged for $terms")
    }
    assert(got.size === queries.distinct.size)
    assert(got.values.forall(_.nonEmpty), "every vocab term matches docs")
  }

  test("concurrent re-export never yields a mixed-epoch read in the local tier") {
    import spark.implicits._
    val docsA = docsFixture
    val docsB = docsFixture.filter($"text".isNotNull && $"doc_id".isNotNull)
      .select(($"doc_id" + 1000L).as("doc_id"),
        concat($"text", lit(" spark hash")).as("text"))
    val idxA = Retrieval.bm25Index(docsA)
    val idxB = Retrieval.bm25Index(docsB)
    val terms = Seq("spark", "hash")

    val refB = Files.createTempDirectory("bm25_local_refB").toString
    IndexExport.exportBm25(idxB, refB, nBuckets = 16)
    val out = Files.createTempDirectory("bm25_local_swap").toString
    IndexExport.exportBm25(idxA, out, nBuckets = 16)
    graft.ext.Dedup.clearSignatureCaches()
    LocalLookup.clearLayouts()
    val expectA = LocalLookup.bm25Single(out, terms, 5)
    val expectB = LocalLookup.bm25Single(refB, terms, 5)
    assert(expectA !== expectB)

    // lookup loop on one thread, the re-export racing it from this one;
    // KeepEpochs retention + per-epoch caches mean every answer is a
    // full epoch-A or epoch-B answer, never a mix or a missing file
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    @volatile var stop = false
    val loop = Future {
      val seen = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(java.lang.Long, Long, Double)]]
      while (!stop) seen += LocalLookup.bm25Single(out, terms, 5)
      seen.toSeq
    }
    IndexExport.exportBm25(idxB, out, nBuckets = 16)
    Thread.sleep(200)
    stop = true
    val seen = Await.result(loop, 60.seconds)
    assert(seen.nonEmpty)
    seen.zipWithIndex.foreach { case (r, i) =>
      assert(r === expectA || r === expectB, s"mixed-epoch read at $i")
    }
    assert(LocalLookup.bm25Single(out, terms, 5) === expectB,
      "a fresh lookup after the swap must serve the new epoch")
  }

  test("routed lookups serve from the local tier: batch-twin parity, zero jobs, capped fallback") {
    import spark.implicits._
    val docs = docsFixture
    val idx = Retrieval.bm25Index(docs)
    val out = Files.createTempDirectory("bm25_routed").toString
    IndexExport.exportBm25(idx, out, nBuckets = 16)
    graft.ext.Dedup.clearSignatureCaches()
    IndexExport.clearReaders()
    LocalLookup.clearLayouts()

    // the q120 shape: per-query batch lookups — expected rows from the
    // FORCED distributed plan, got rows from the routed (local) path
    val queries = Seq(0L -> Seq("spark", "table"), 1L -> Seq("scan"),
      2L -> Seq("absent_term"), 3L -> Seq("net", "ram", "row", "col"))
    val expected = forceDistributed(queries.map { case (qid, ts) =>
      IndexExport.bm25Lookup(spark, out, Seq(qid -> ts), 5)
        .collect().map(_.toSeq).toSet
    })
    // NOTE: "spark" matches the NULL-doc_id row, so its batch twin
    // declines (primitive-long udaf boxing) and falls back — parity
    // still holds, the zero-jobs claim is only for declinable-free
    // queries like 1L/3L below
    val got = queries.map { case (qid, ts) =>
      IndexExport.bm25Lookup(spark, out, Seq(qid -> ts), 5)
        .collect().map(_.toSeq).toSet
    }
    queries.lazyZip(expected).lazyZip(got).foreach { (q, exp, act) =>
      assert(act === exp, s"routed batch divergence for $q")
    }
    assert(got.exists(_.nonEmpty))

    // zero Spark jobs for a local-served batch lookup (no null-id match)
    IndexExport.bm25Lookup(spark, out, Seq(1L -> Seq("scan")), 5) // warm
    val before = stableJobCount()
    val rows = LocalLookup.bm25BatchLocal(out, Seq(1L -> Seq("scan")), 5,
      IndexExport.LocalLookupCap)
    val after = stableJobCount()
    assert(after === before, "local batch lookup must run zero Spark jobs")
    assert(rows.exists(_.nonEmpty))

    // the cap: a query whose matched postings exceed it declines (the
    // distributed plan serves it — identical rows)
    assert(LocalLookup.bm25BatchLocal(out, Seq(1L -> Seq("scan")), 5, 0L)
      === None)
    assert(LocalLookup.bm25SingleCapped(out, Seq("scan"), 5, 0L) === None)
    val capped = {
      val prev = IndexExport.LocalLookupCap
      IndexExport.LocalLookupCap = 0L
      try IndexExport.bm25Lookup(spark, out, Seq(1L -> Seq("scan")), 5)
        .collect().map(_.toSeq).toSet
      finally IndexExport.LocalLookupCap = prev
    }
    assert(capped === expected(1))
  }

  test("local bm25 over an empty-corpus export returns empty") {
    import spark.implicits._
    val idx = Retrieval.bm25Index(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    val out = Files.createTempDirectory("bm25_local_empty").toString
    IndexExport.exportBm25(idx, out, nBuckets = 8)
    graft.ext.Dedup.clearSignatureCaches()
    LocalLookup.clearLayouts()
    assert(LocalLookup.bm25Single(out, Seq("spark"), 5) === Seq.empty)
  }

  test("local pq lookup equals the Spark pqLookup plan, with zero Spark jobs") {
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
    val out = Files.createTempDirectory("pq_local").toString
    IndexExport.exportPqCells(emb, cents, cbs, out)
    LocalLookup.clearLayouts()

    val qids = Seq(0L, 7L, 42L, 133L)
    val qvecs = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val cases = for (qid <- qids; nprobe <- Seq(1, 2, 4)) yield (qid, nprobe)
    val expected = cases.map { case (qid, nprobe) =>
      IndexExport.pqLookup(spark, out, qvecs(qid), qid, 10, cbs, cents, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    val before = stableJobCount()
    val got = cases.map { case (qid, nprobe) =>
      LocalLookup.pqSingle(out, qvecs(qid), qid, 10, cbs, cents, nprobe)
    }
    val after = stableJobCount()
    assert(after === before, "local pq lookup must run zero Spark jobs")
    cases.lazyZip(expected).lazyZip(got).foreach { (c, exp, act) =>
      assert(act === exp, s"divergence for (qid, nprobe)=$c")
    }
    assert(expected.forall(_.nonEmpty))
  }
}
