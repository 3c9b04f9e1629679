package graft.jobs

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Checkpoint-recovery evidence for the at-least-once + idempotent-sink
  * story (SURVEY §2.4): every test STOPS a running streaming query,
  * restarts a new query instance from the same checkpoint, and asserts
  * the post-restart state equals the uninterrupted run —
  *
  *  - the upsert sink converges through a restart even when the crash
  *    window forces a full batch REPLAY (commit marker deleted, so the
  *    restarted query recomputes the last batch against a snapshot that
  *    already contains it);
  *  - dropDuplicatesWithinWatermark's key state survives the restart (a
  *    duplicate arriving after recovery is still suppressed);
  *  - the windowed aggregation's watermark survives the restart (a
  *    finalized window is not re-opened, late data stays dropped, and no
  *    window is emitted twice across the stop/restart boundary).
  *
  * Parameterized over the state-store provider like StreamOpsBehaviors:
  * recovery must hold on the default HDFS-backed store AND on RocksDB
  * (whose state files are a different on-disk format — the restore path
  * is provider code, not shared code, so green on one proves nothing
  * about the other).
  */
abstract class CheckpointRecoveryBehaviors(stateStoreProvider: Option[String])
    extends AnyFunSuite with StateStoreCheck {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    stateStoreProvider.foreach(
      s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    s
  }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** stop() + wait until the run is fully deregistered — starting the
    * successor while the predecessor still holds the checkpoint trips
    * [STREAM_FAILED] "multiple streaming queries ... concurrently".
    */
  private def stopAndWait(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.stop()
    q.awaitTermination()
  }

  test("upsert sink restart from checkpoint converges, replayed batch included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def runInterrupted(forceReplay: Boolean): Seq[(Long, String, Long)] = {
      val in = MemoryStream[(Long, String, Long)]
      val out = Files.createTempDirectory("ckpt_upsert_out").toString
      val ckpt = Files.createTempDirectory("ckpt_upsert_ck").toString
      def start() = in.toDF().toDF("track_id", "payload", "seq")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(UpsertSink.foreachBatchUpsert(out, "track_id", "seq") _)
        .start()
      val q1 = start()
      in.addData((1L, "a", 1L), (2L, "b", 1L))
      q1.processAllAvailable()
      stopAndWait(q1)
      if (forceReplay) {
        // crash window: the sink wrote and swapped the pointer but the
        // query died BEFORE recording the commit — the restarted query
        // must recompute batch 0 from its offsets file and re-upsert it
        // against a snapshot that already contains it
        val commit = Paths.get(ckpt, "commits", "0")
        assert(Files.deleteIfExists(commit), s"no commit marker at $commit")
        // the local checksummed FS keeps a .crc sidecar per metadata
        // file; left behind it makes the re-commit's rename collide and
        // misreport as a concurrent-query conflict
        Files.deleteIfExists(Paths.get(ckpt, "commits", ".0.crc"))
      }
      // data arriving while the query is down
      in.addData((1L, "a2", 2L), (3L, "c", 1L))
      val q2 = start()
      q2.processAllAvailable()
      stopAndWait(q2)
      UpsertSink.latest(spark, out)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    }

    // uninterrupted control: one query, same data, no stop
    val ctrl = {
      val in = MemoryStream[(Long, String, Long)]
      val out = Files.createTempDirectory("ckpt_upsert_ctl").toString
      val ckpt = Files.createTempDirectory("ckpt_upsert_ctlck").toString
      val q = in.toDF().toDF("track_id", "payload", "seq")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(UpsertSink.foreachBatchUpsert(out, "track_id", "seq") _)
        .start()
      in.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      in.addData((1L, "a2", 2L), (3L, "c", 1L))
      q.processAllAvailable()
      stopAndWait(q)
      UpsertSink.latest(spark, out)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    }

    assert(ctrl === Seq((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 1L)))
    assert(runInterrupted(forceReplay = false) === ctrl,
      "clean stop/restart must converge to the uninterrupted snapshot")
    assert(runInterrupted(forceReplay = true) === ctrl,
      "restart replaying an already-applied batch must converge (idempotence)")
  }

  test("dedup state survives restart: post-recovery duplicate still suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val ckpt = Files.createTempDirectory("ckpt_dedup").toString
    // the memory sink refuses an existing checkpoint
    // ([UNSUPPORTED_FEATURE.QUERY_RECOVERY]) — collect emitted rows
    // driver-side per run instead, the foreachBatch sink recovery
    // supports
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    def start() = StreamOps.dedupWithinWatermark(
        in.toDF().toDF("event_id", "ts"), "ts", Seq("event_id"), "30 minutes")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => emitted.add(r.getLong(0)))
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    in.addData((1L, ts(0)), (2L, ts(5)))
    q1.processAllAvailable()
    stopAndWait(q1)
    assert(emitted.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      === Set(1L, 2L))
    assertProviderEngaged(ckpt)
    emitted.clear()

    // restart: id=1 arrives again WITHIN the watermark horizon — only
    // restored state can know it is a duplicate; id=3 is genuinely new
    val q2 = start()
    in.addData((1L, ts(6)), (3L, ts(7)))
    q2.processAllAvailable()
    stopAndWait(q2)
    assert(emitted.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
      === Set(3L),
      "duplicate id=1 must be suppressed by state restored from the checkpoint")
  }

  test("watermark survives restart: finalized window stays closed, none emit twice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val ckpt = Files.createTempDirectory("ckpt_window").toString
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Timestamp, Long)]
    def start() = StreamOps.windowedCounts(
        in.toDF().toDF("ts", "user_id"), "ts", "user_id",
        windowDur = "10 minutes", watermarkDelay = "2 minutes")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select(col("window_start"), col("n_events")).collect()
          .foreach(r => emitted.add((r.getTimestamp(0), r.getLong(1))))
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    in.addData((ts(0), 1L), (ts(5), 1L)) // window [10:00,10:10): 2 events
    q1.processAllAvailable()
    in.addData((ts(30), 1L)) // watermark -> 10:28, finalizes [10:00,10:10)
    q1.processAllAvailable()
    stopAndWait(q1)
    val run1 = emitted.toArray(Array.empty[(Timestamp, Long)]).toSeq
    assert(run1 === Seq((ts(0), 2L)), "first window finalized before the stop")
    assertProviderEngaged(ckpt)
    emitted.clear()

    // restart: a late event into the finalized window must STILL be
    // dropped (only the restored watermark knows the window is closed),
    // and closing the [10:30,10:40) window must emit it exactly once
    // with the pre-restart event counted from restored state
    val q2 = start()
    in.addData((ts(1), 1L)) // late into the closed window
    q2.processAllAvailable()
    in.addData((ts(31), 1L), (ts(50), 1L)) // +1 to 10:30 window, then close it
    q2.processAllAvailable()
    stopAndWait(q2)
    val run2 = emitted.toArray(Array.empty[(Timestamp, Long)]).toSeq
    assert(run2 === Seq((ts(30), 2L)),
      "exactly the 10:30 window (pre-restart event + post-restart event), " +
        s"no re-emission of the closed window — got $run2")
  }
}

/** Default (HDFS-backed in-memory) state store provider. */
class CheckpointRecoverySpec extends CheckpointRecoveryBehaviors(None)

/** RocksDB provider — different state file format, different restore
  * path.
  */
class CheckpointRecoveryRocksDBSpec extends CheckpointRecoveryBehaviors(
  Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
  override protected def stateFileMarkers: Seq[String] =
    Seq(".zip", ".changelog")
}
