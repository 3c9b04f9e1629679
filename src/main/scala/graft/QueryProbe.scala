package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement main (guide §1): run one or more SparkEntry queries with a
  * job/stage listener and print, per query, wall-clock, Spark job count,
  * summed job wall (end-start), summed executor task time, and the
  * top job call sites — the attribution that separates "driver-side
  * plan/analysis time" (wall ≫ job wall) from "many tiny jobs"
  * (jobs ≫ expected) from "real task compute" (task time ≈ wall × cores).
  *
  * Usage: runMain graft.QueryProbe <q>[,<q>...] [sfDir] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_agg"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B experiment hook: SPARK_GRAFT_PROBE_CONF="k=v;k2=v2" applies
    // extra session confs so config hypotheses are measurable without a
    // code change per trial.
    val extra = sys.env.get("SPARK_GRAFT_PROBE_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0)((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)

    final case class J(id: Int, site: String, start: Long, var end: Long = -1L)
    val jobs = new ConcurrentLinkedQueue[J]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val nStages = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val r = J(js.jobId, site, js.time)
        jobs.add(r); byId.put(js.jobId, r); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(byId.get(je.jobId)).foreach(_.end = je.time); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        taskTime.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        nTasks.addAndGet(sc.stageInfo.numTasks)
        nStages.incrementAndGet(); ()
      }
    })

    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"unknown query: $n")
        case Some(fn) =>
          (1 to reps).foreach { rep =>
            jobs.clear(); byId.clear(); taskTime.set(0L)
            nTasks.set(0L); nStages.set(0L)
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            // settle async listener events before reading them
            Thread.sleep(300)
            val js = jobs.toArray(Array.empty[J])
            val jobWall = js.iterator
              .map(j => math.max(0L, j.end - j.start)).sum / 1e3
            val top = js.groupBy(_.site).view
              .mapValues(a => (a.length,
                a.iterator.map(j => math.max(0L, j.end - j.start)).sum))
              .toSeq.sortBy(-_._2._2).take(12)
            println(f"""== $n%s rep$rep: wall=$wall%.2fs jobs=${js.length}%d stages=${nStages.get}%d tasks=${nTasks.get}%d jobWall=$jobWall%.2fs taskTime=${taskTime.get / 1e3}%.2fs""")
            top.foreach { case (site, (cnt, ms)) =>
              println(f"   ${ms / 1e3}%7.2fs x$cnt%-4d $site%s")
            }
            graft.ext.Dedup.clearSignatureCaches(blocking = true)
            graft.streaming.StreamOps.clearStaticIndexes(blocking = true)
          }
      }
    }
    spark.stop()
  }
}
