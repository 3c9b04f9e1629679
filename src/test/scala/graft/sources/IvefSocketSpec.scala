package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ais.{Ivef, IvefFixtures}

/** S10 live-protocol shell against a REAL server: login package on both
  * connects, Ping answered with a Pong echoing the ping's MsgRefId,
  * protocol frames (LoginResponse/Ping) not emitted as rows, heartbeat
  * silence forcing a reconnect + re-login, and the delivered documents
  * parsing into the same Swasla rows as the batch path.
  */
class IvefSocketSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def readUntilCloseTag(sock: Socket): String = {
    val in = sock.getInputStream
    val sb = new StringBuilder
    var b = in.read()
    while (b != -1 && !sb.endsWith("</MSG_IVEF>")) {
      sb.append(b.toChar)
      b = in.read()
    }
    sb.toString
  }

  test("ivef socket: login, pong, heartbeat reconnect, doc parity") {
    import spark.implicits._
    val server = new ServerSocket(0)
    val logins = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val pongs = new java.util.concurrent.CopyOnWriteArrayList[String]()

    val serverThread = new Thread(() => {
      // connection 1: login -> LoginResponse + Ping -> expect Pong ->
      // two track docs -> go silent (heartbeat expires client-side)
      val s1 = server.accept()
      logins.add(readUntilCloseTag(s1))
      val out1 = s1.getOutputStream
      out1.write(
        """<MSG_IVEF><Header MsgRefId="{login-resp}" Version="0.2.5"/><Body><LoginResponse Status="OK"/></Body></MSG_IVEF>""".stripMargin.getBytes(UTF_8))
      out1.write('\n')
      out1.write(
        """<MSG_IVEF><Header MsgRefId="{ping-1}" Version="0.2.5"/><Body><Ping TimeStamp="2024-01-01T00:00:00Z"/></Body></MSG_IVEF>""".getBytes(UTF_8))
      out1.write('\n')
      out1.flush()
      pongs.add(readUntilCloseTag(s1))
      out1.write((IvefFixtures.docs(0)._2 + "\n").getBytes(UTF_8))
      out1.write((IvefFixtures.docs(1)._2 + "\n").getBytes(UTF_8))
      out1.flush()
      // silence: client's 1 s heartbeat window expires, it reconnects

      val s2 = server.accept()
      logins.add(readUntilCloseTag(s2))
      val out2 = s2.getOutputStream
      out2.write((IvefFixtures.docs(2)._2 + "\n").getBytes(UTF_8))
      out2.flush()
      // keep connection 2 alive with pings so the client stays put
      try {
        while (true) {
          Thread.sleep(300)
          out2.write(
            """<MSG_IVEF><Header MsgRefId="{ping-n}" Version="0.2.5"/><Body><Ping TimeStamp="2024-01-01T00:00:01Z"/></Body></MSG_IVEF>""".getBytes(UTF_8))
          out2.write('\n')
          out2.flush()
        }
      } catch { case _: Exception => () }
    }, "ivef-test-server")
    serverThread.setDaemon(true)
    serverThread.start()

    val stream = Sources.ivefStream(spark, "127.0.0.1", server.getLocalPort,
      name = "C4ISR-test", password = "pw", heartbeatSec = 1L)
    val q = stream.writeStream.format("memory").queryName("ivef_docs")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      def got() = spark.table("ivef_docs").count()
      while (got() < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }

      assert(logins.size === 2, "reconnect must re-login")
      logins.forEach { l =>
        assert(l.contains("<LoginRequest"), l)
        assert(l.contains("""Name="C4ISR-test""""), l)
        assert(l.contains("""Password="pw""""), l)
        assert(l.contains("""Version="0.2.5""""), l)
      }
      assert(pongs.size === 1)
      assert(pongs.get(0).contains("<Pong"), pongs.get(0))
      assert(pongs.get(0).contains("""ResponseOn="{ping-1}""""), pongs.get(0))

      val rows = spark.table("ivef_docs").as[(Long, String)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L), "seq = arrival order")
      assert(rows.forall(!_._2.contains("<Ping")), "protocol frames must not be rows")
      assert(rows.forall(!_._2.contains("<LoginResponse")))
      // streamed docs parse into exactly the batch path's Swasla rows
      val streamedSwasla = rows.flatMap(r => Ivef.parseDoc(r._2)).toSeq
      val batchSwasla = IvefFixtures.docs.take(3).flatMap(d => Ivef.parseDoc(d._2))
      assert(streamedSwasla === batchSwasla)
      assert(batchSwasla.nonEmpty)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("frame decode: UTF-8 multi-byte intact, U+FFFD stripped, malformed dropped") {
    def feed(bytes: Array[Byte]): Option[String] = {
      val buf = new IvefSocket.FrameBuf
      bytes.foreach(b => buf.add(b & 0xFF))
      assert(buf.tailIs(IvefSocket.CloseTag))
      buf.decodeUtf8
    }
    // multi-byte content (Ø = C3 98 shares no bytes with the EF/BF/BD
    // skip, é = C3 A9) survives the byte-accumulate + frame decode —
    // the per-byte toChar path would emit mojibake here
    val doc = "<MSG_IVEF><Body><ObjectData Name=\"SØRØYA é\"/></Body></MSG_IVEF>"
    assert(feed(doc.getBytes(UTF_8)) === Some(doc))
    // encoded replacement chars (EF BF BD) are stripped AFTER decoding,
    // mirroring the reference's skip without corrupting real sequences
    val withFffd = "<MSG_IVEF><Body a=\"x�y\"/></MSG_IVEF>"
    assert(feed(withFffd.getBytes(UTF_8)) ===
      Some("<MSG_IVEF><Body a=\"xy\"/></MSG_IVEF>"))
    // a frame that is not valid UTF-8 is dropped (reference parity with
    // its failed per-byte decode), not emitted as mojibake
    val malformed = "<MSG_IVEF><Body a=\"".getBytes(UTF_8) ++
      Array(0xC3.toByte) ++ "\"/></MSG_IVEF>".getBytes(UTF_8)
    assert(feed(malformed) === None)
  }
}
