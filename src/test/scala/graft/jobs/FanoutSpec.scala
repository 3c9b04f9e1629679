package graft.jobs

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FanoutHub, FanoutSink, SocketFanoutServer}

/** S4/S5 fan-out: three REAL TCP clients subscribe; all receive every
  * JSON row; one disconnects mid-stream and the hub drops it without
  * stalling the query or the surviving clients.
  */
class FanoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private final class TestClient(port: Int) {
    val sock = new Socket("127.0.0.1", port)
    private val rd = new BufferedReader(
      new InputStreamReader(sock.getInputStream, UTF_8))
    val received = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val t = new Thread(() => {
      try {
        var l = rd.readLine()
        while (l != null) { received.add(l); l = rd.readLine() }
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true)
    t.start()
  }

  private def awaitUntil(deadlineMs: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(50)
    assert(cond)
  }

  test("multi-client fan-out with disconnect tolerance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hub = new FanoutHub()
    val server = new SocketFanoutServer(hub)
    val c1 = new TestClient(server.boundPort)
    val c2 = new TestClient(server.boundPort)
    val c3 = new TestClient(server.boundPort)
    awaitUntil()(hub.liveClients.size == 3)

    val mem = MemoryStream[(Long, String)]
    val q = FanoutSink.start(mem.toDS().toDF("mmsi", "status"), hub, "fanout")
    try {
      mem.addData((1L, "under way"), (2L, "moored"))
      q.processAllAvailable()
      awaitUntil()(c1.received.size == 2 && c2.received.size == 2 &&
        c3.received.size == 2)
      val batch1 = Set(
        """{"mmsi":1,"status":"under way"}""",
        """{"mmsi":2,"status":"moored"}""")
      assert(Set(c1.received.toArray: _*).map(_.toString) === batch1)
      assert(Set(c3.received.toArray: _*).map(_.toString) === batch1)

      // client 2 walks away; the next publishes hit its dead socket and
      // the hub sweeps it, while 1 and 3 keep receiving everything
      c2.sock.close()
      mem.addData((3L, "aground"))
      q.processAllAvailable()
      mem.addData((4L, "fishing"))
      q.processAllAvailable()
      def data(c: TestClient): Seq[String] =
        c.received.toArray.map(_.toString).filterNot(_.contains("hb")).toSeq
      awaitUntil()(data(c1).length == 4 && data(c3).length == 4)
      // a closed peer only surfaces as an IOException once enough writes
      // flush through the OS buffer — pump heartbeats until the sweep
      awaitUntil() {
        hub.publish("""{"hb":true}""")
        hub.liveClients == Set("client-1", "client-3")
      }
      assert(data(c1) === data(c3))
    } finally {
      q.stop()
      hub.shutdown()
      server.close()
    }
  }
}
