package graft.jobs

import java.io.{BufferedReader, InputStreamReader}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ais.{AisDecoder, Fixtures}
import graft.ops.Reassembly
import graft.sources.Sources
import graft.streaming.{FanoutHub, FanoutSink, SocketFanoutServer}

/** The full live wire: TCP NMEA feed (S2, preamble auth) -> fragment
  * parse -> stateful reassembly (R13) -> native decode (E5) -> position
  * projection (R2) -> JSON fan-out to TCP subscribers (S4/S5). One
  * streaming query, two real socket hops, expected rows derived from
  * the batch pipeline over the same sentences.
  *
  * Parameterized over the state-store provider like StreamOpsBehaviors:
  * [[LivePipelineRocksDBSpec]] runs the SAME wire with reassembly state
  * on RocksDB — the deployment shape for ingest-scale key cardinality.
  */
abstract class LivePipelineBehaviors(stateStoreProvider: Option[String])
    extends AnyFunSuite with StateStoreCheck {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession() // own SQLConf: provider must not leak across suites
    stateStoreProvider.foreach(
      s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    s
  }

  test("socket feed to fan-out subscribers end to end") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val allLines = Fixtures.sentenceGroups.flatMap(_._2)

    // upstream feed
    val feed = new ServerSocket(0)
    val feeder = new Thread(() => {
      val sock = feed.accept()
      val in = sock.getInputStream
      var zeros = 0
      var b = in.read()
      while (zeros < 2 && b != -1) { // consume the auth preamble
        if (b == 0) zeros += 1
        if (zeros < 2) b = in.read()
      }
      val out = sock.getOutputStream
      allLines.foreach(l => out.write((l + "\n").getBytes(UTF_8)))
      out.flush()
    }, "live-feeder")
    feeder.setDaemon(true)
    feeder.start()

    // downstream subscribers
    val hub = new FanoutHub()
    val egress = new SocketFanoutServer(hub)
    def subscribe(): (Socket, java.util.List[String]) = {
      val s = new Socket("127.0.0.1", egress.boundPort)
      val lines = new java.util.concurrent.CopyOnWriteArrayList[String]()
      val t = new Thread(() => {
        try {
          val rd = new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8))
          var l = rd.readLine()
          while (l != null) { lines.add(l); l = rd.readLine() }
        } catch { case _: java.io.IOException => () }
      })
      t.setDaemon(true)
      t.start()
      (s, lines)
    }
    val (_, sub1) = subscribe()
    val (_, sub2) = subscribe()
    val subDeadline = System.currentTimeMillis() + 30000
    while (hub.liveClients.size < 2 && System.currentTimeMillis() < subDeadline)
      Thread.sleep(50)
    assert(hub.liveClients.size === 2)

    // expected: batch pipeline, positions only
    def positionsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter($"d.messageType".isin(1, 2, 3))
      .select($"d.mmsi".as("mmsi"),
        $"d.position.latitude".as("lat"), $"d.position.longitude".as("lon"))
    val expected = positionsOf(GoldJob.decode(allLines.toDF("value")))
      .as[(Long, Double, Double)].collect().toSet
    assert(expected.nonEmpty)

    // the live query: socket -> reassemble -> decode -> positions -> fan-out
    val lines = Sources.tcpLines(spark, "127.0.0.1", feed.getLocalPort,
      user = Some("u"), password = Some("p"))
    val live = positionsOf(
      Reassembly.assembleStream(
          Reassembly.parseFragments(lines).as[Reassembly.Fragment])
        .toDF()
        .withColumn("d", AisDecoder.ais_decode($"sentences"))
        .filter($"d".isNotNull))
    val ckpt = java.nio.file.Files.createTempDirectory("live_ckpt").toString
    val q = FanoutSink.start(live, hub, "live_positions", Some(ckpt))
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (sub1.size < expected.size && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
      def parse(l: java.util.List[String]) = l.toArray.map(_.toString).map { j =>
        val m = """"mmsi":(\d+).*"lat":([-\d.E]+),"lon":([-\d.E]+)""".r
          .findFirstMatchIn(j).get
        (m.group(1).toLong, m.group(2).toDouble, m.group(3).toDouble)
      }.toSet
      assert(parse(sub1) === expected, "subscriber 1 must see every position")
      assert(parse(sub2) === expected, "subscriber 2 must see every position")
      // the reassembly state actually lives on the configured provider
      assertProviderEngaged(ckpt)
    } finally {
      q.stop()
      hub.shutdown()
      egress.close()
      feed.close()
    }
  }
}

/** The live wire on the default HDFS-backed in-memory state store. */
class LivePipelineSpec extends LivePipelineBehaviors(None)

/** The live wire with reassembly state on RocksDB — ingest-scale shape. */
class LivePipelineRocksDBSpec extends LivePipelineBehaviors(
  Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
  override protected def stateFileMarkers: Seq[String] =
    Seq(".zip", ".changelog")
}
