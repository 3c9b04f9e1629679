package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Diagnostic main: attribute the streaming-ingest per-batch JOB FLOOR
  * to call sites. Drives a few micro-batches through the real
  * `CurationStream.ingestStream` over a tiny fixture and prints, per
  * batch, every Spark job's call site and duration, then a grouped
  * rollup — the measurement that tells the floor-cutting work WHICH of
  * the ~30 stages to fuse next instead of guessing.
  *
  * Usage: runMain graft.JobAudit [nStoreDocs] [nBatches]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val nStore = args.headOption.map(_.toInt).getOrElse(40)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    final case class JobRow(id: Int, site: String, call: String,
      group: String, start: Long, var end: Long = -1L)
    val jobs = new ConcurrentLinkedQueue[JobRow]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val call = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        val grp = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("")
        val r = JobRow(js.jobId, site, call, grp, js.time)
        jobs.add(r); byId.put(js.jobId, r); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(byId.get(je.jobId)).foreach(_.end = je.time); ()
      }
    })

    // fixture: digit-free texts, one-hot embeddings (the spec shapes)
    def text(tag: String, i: Int): String =
      (0 until 20).map(j => s"${tag}w${('a' + ((i * 7 + j) % 26)).toChar}tok$j")
        .mkString(" ").replaceAll("[0-9]", "x")
    val storeRows = (1 to nStore).map(i =>
      (i.toLong, "en", "web", 50L, text("s", i)))
    val deltaRows = (1 to nBatches * 3).map(i =>
      ((nStore + i).toLong, "en", "web", 50L, text("d", i)))
    val allIds = storeRows.map(_._1) ++ deltaRows.map(_._1)
    val emb = allIds.zipWithIndex.map { case (id, i) =>
      (id, (0 until 64).map(d => if (d == i % 64) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val trained = graft.ext.Similarity
      .kmeansCentroids(emb, k = 16, iters = 1, roundTo = 4)
    val holdout = Seq.empty[(Long, String, String, Long, String)]
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val storeDir = java.nio.file.Files.createTempDirectory("jobaudit").toString
    val ckpt = java.nio.file.Files.createTempDirectory("jobaudit_ck").toString
    graft.streaming.CurationStream.initStore(
      storeRows.toDF("doc_id", "lang", "source", "n_chars", "text"), storeDir)

    val in = MemoryStream[(Long, String, String, Long, String)]
    val q = graft.streaming.CurationStream.ingestStream(
      in.toDF().toDF("doc_id", "lang", "source", "n_chars", "text"),
      emb, trained, holdout, storeDir, ckpt)
    try {
      (0 until nBatches).foreach { b =>
        jobs.clear()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        in.addData(deltaRows.slice(b * 3, b * 3 + 3): _*)
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val w1 = System.currentTimeMillis()
        Thread.sleep(500) // let listener events drain
        Option(q.lastProgress).foreach { p =>
          println(s"  progress durationMs: ${p.durationMs}")
        }
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.sortBy(_.start)
        println(f"== batch $b: ${rows.size} jobs, $sec%.1f s ==")
        // per-job timeline: duration + the DRIVER GAP since the
        // previous job ended — the gaps are the non-job floor
        var prevEnd = rows.headOption.map(_.start).getOrElse(0L)
        var gapSum = 0.0
        var durSum = 0.0
        rows.foreach { r =>
          val gap = math.max(0L, r.start - prevEnd) / 1000.0
          val dur = (if (r.end > 0) r.end - r.start else 0L) / 1000.0
          gapSum += gap; durSum += dur
          println(f"  job ${r.id}%4d gap $gap%6.2f s dur $dur%6.2f s  " +
            f"${r.site}%-40s ${r.call}")
          prevEnd = math.max(prevEnd, if (r.end > 0) r.end else r.start)
        }
        println(f"  TOTAL gaps $gapSum%.1f s, job-dur $durSum%.1f s over ${rows.size} jobs")
        // grouped rollup: which call sites own the job COUNT
        rows.groupBy(_.site).toSeq
          .map { case (site, rs) =>
            (site, rs.size, rs.map(r =>
              (if (r.end > 0) r.end - r.start else 0L) / 1000.0).sum)
          }
          .sortBy(-_._2)
          .foreach { case (site, n, dur) =>
            println(f"    site $site%-45s jobs $n%2d dur $dur%5.2f s")
          }
        rows.headOption.foreach { h =>
          val lastEnd = rows.map(r => if (r.end > 0) r.end else r.start).max
          println(f"  HEAD ${(h.start - w0) / 1000.0}%.1f s before first job, " +
            f"TAIL ${(w1 - lastEnd) / 1000.0}%.1f s after last job")
        }
      }
    } finally q.stop()

    // ---- driver-phase attribution: where do the ~30 s of NON-job time
    // go? Time analysis/optimization/physical planning of the pieces.
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  plan-phase $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.queries.Curation
    val store = graft.streaming.CurationStream.readStore(spark, storeDir)
      .drop("ingest_batch", "n_tok")
    val clD = Curation.clean(
      deltaRows.toDF("doc_id", "lang", "source", "n_chars", "text"))
    println("== ingestDelta plan phases ==")
    val mf = t("construct (incl. eager holdout prep)")(
      Curation.ingestDelta(spark, store, holdout, clD, emb, trained))
    t("analyze")(mf.queryExecution.analyzed)
    t("optimize")(mf.queryExecution.optimizedPlan)
    t("physical")(mf.queryExecution.executedPlan)
    t("execute count")(mf.count())
    println(s"  registered sig caches: ${graft.ext.Dedup.registeredSignatureCacheCount}")
    t("clearSignatureCaches(non-blocking)")(
      graft.ext.Dedup.clearSignatureCaches())
    println("== ivfAssign alone ==")
    val as1 = graft.ext.Similarity.ivfAssign(emb, trained)
    t("analyze")(as1.queryExecution.analyzed)
    t("optimize")(as1.queryExecution.optimizedPlan)
    t("physical")(as1.queryExecution.executedPlan)
    t("execute count")(as1.count())
    spark.stop()
  }
}
