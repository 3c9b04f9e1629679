package graft.jobs

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FanoutHub, FanoutSink, SocketFanoutServer, WebSocket, WebSocketFanoutServer}

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

  test("Sec-WebSocket-Accept matches the RFC 6455 worked example") {
    // RFC 6455 §1.3: the sample nonce and its published accept value
    assert(WebSocket.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  /** Hand-rolled ws client: raw socket + explicit handshake + explicit
    * frame encode/decode — nothing borrowed from the server code except
    * the accept-key expectation under test.
    */
  private final class WsClient(port: Int, key: String) {
    val sock = new Socket("127.0.0.1", port)
    private val in = sock.getInputStream
    private val out = sock.getOutputStream

    val handshakeResponse: String = {
      out.write(
        (s"GET /feed HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n")
          .getBytes(UTF_8))
      out.flush()
      val sb = new StringBuilder
      while (!sb.endsWith("\r\n\r\n")) {
        val c = in.read()
        assert(c >= 0, "EOF during handshake")
        sb.append(c.toChar)
      }
      sb.toString
    }

    /** Client frames must be masked (RFC 6455 §5.1). */
    def sendFrame(opcode: Int, payload: Array[Byte]): Unit = {
      assert(payload.length < 126, "test client only does short frames")
      val mask = Array[Byte](0x12, 0x34, 0x56, 0x78)
      val masked = payload.zipWithIndex.map { case (b, i) =>
        (b ^ mask(i & 3)).toByte
      }
      out.write(Array[Byte]((0x80 | opcode).toByte,
        (0x80 | payload.length).toByte) ++ mask ++ masked)
      out.flush()
    }

    /** Server frames are unmasked; decode one: (opcode, payload). */
    def readFrame(): (Int, Array[Byte]) = {
      val b0 = in.read(); assert(b0 >= 0, "EOF")
      assert((b0 & 0x80) != 0, "server frame must have FIN")
      val b1 = in.read()
      assert((b1 & 0x80) == 0, "server frame must be unmasked")
      var len: Long = b1 & 0x7F
      if (len == 126) len = (in.read() << 8 | in.read()).toLong
      else if (len == 127) {
        len = 0L; for (_ <- 0 until 8) len = (len << 8) | in.read()
      }
      val p = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val r = in.read(p, off, len.toInt - off); assert(r >= 0, "EOF")
        off += r
      }
      (b0 & 0x0F, p)
    }
  }

  test("websocket frame codec round-trips every length-encoding regime") {
    // 7-bit (<126), 16-bit (126..65535), 64-bit (>65535) length paths,
    // plus the boundaries themselves. encodeFrame emits unmasked SERVER
    // frames; readFrame parses CLIENT frames and (RFC 6455 §5.1)
    // rejects unmasked ones — so round-trip through a client-side
    // masking step, and pin the unmasked rejection too.
    def maskFrame(framed: Array[Byte], payloadLen: Int): Array[Byte] = {
      val headerLen = framed.length - payloadLen
      val mask = Array[Byte](0x12, 0x34, 0x56, 0x78)
      val header = framed.take(headerLen).clone()
      header(1) = (header(1) | 0x80).toByte // set MASK bit
      val body = framed.drop(headerLen).zipWithIndex.map { case (b, i) =>
        (b ^ mask(i & 3)).toByte
      }
      header ++ mask ++ body
    }
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 125, 126, 127, 65535, 65536, 70000)) {
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val framed = WebSocket.encodeFrame(0x1, payload)
      val in = new java.io.ByteArrayInputStream(maskFrame(framed, n))
      val Some((op, got)) = WebSocket.readFrame(in)
      assert(op === 0x1)
      assert(java.util.Arrays.equals(got, payload), s"n=$n")
      assert(in.read() === -1, s"n=$n: trailing bytes after frame")
      // the same frame without the mask is a protocol error -> None
      assert(WebSocket.readFrame(new java.io.ByteArrayInputStream(framed)).isEmpty,
        s"n=$n: unmasked client frame must be rejected")
    }
  }

  test("readFrame maps truncated headers and hostile lengths to None") {
    import java.io.ByteArrayInputStream
    def frame(bytes: Int*): Option[(Int, Array[Byte])] =
      WebSocket.readFrame(new ByteArrayInputStream(bytes.map(_.toByte).toArray))
    // EOF mid-16-bit-length (the old code folded -1 into the length)
    assert(frame(0x81, 0xFE, 0x01).isEmpty)
    // EOF mid-64-bit-length
    assert(frame(0x81, 0xFF, 0x00, 0x00, 0x00).isEmpty)
    // EOF mid-mask-key
    assert(frame(0x81, 0x85, 0x12, 0x34).isEmpty)
    // 64-bit length with the sign bit set (illegal per RFC 6455 §5.2)
    assert(frame(0x81, 0xFF, 0x80, 0, 0, 0, 0, 0, 0, 1, 0x00).isEmpty)
    // absurd length above the inbound cap: rejected before allocation
    assert(frame(0x81, 0xFF, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x00).isEmpty)
    // sanity: a well-formed empty masked frame still parses
    val ok = frame(0x89, 0x80, 0x12, 0x34, 0x56, 0x78)
    assert(ok.exists { case (op, p) => op == 0x9 && p.isEmpty })
  }

  test("readFrame is total over arbitrary byte streams (seeded fuzz)") {
    // the per-client reader must drop a hostile peer via the normal
    // None path — readFrame may never throw, whatever bytes arrive
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(40)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // exception = test failure; Some/None both acceptable
      WebSocket.readFrame(new java.io.ByteArrayInputStream(bytes))
    }
  }

  test("acceptor survives broken and silent handshakes") {
    val hub = new FanoutHub()
    val server = new WebSocketFanoutServer(hub)
    try {
      // peer 1: connects and goes silent — must not block later accepts
      val silent = new Socket("127.0.0.1", server.boundPort)
      // peer 2: half a request line, then vanishes mid-handshake
      val broken = new Socket("127.0.0.1", server.boundPort)
      broken.getOutputStream.write("GET /feed HTT".getBytes(UTF_8))
      broken.getOutputStream.flush()
      broken.close()
      // peer 3: garbage headers with no websocket key -> 400, socket shut
      val noKey = new Socket("127.0.0.1", server.boundPort)
      noKey.getOutputStream.write(
        "GET / HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(UTF_8))
      noKey.getOutputStream.flush()
      val resp = new Array[Byte](12)
      assert(noKey.getInputStream.read(resp) > 0)
      assert(new String(resp, UTF_8).startsWith("HTTP/1.1 400"))

      // a real client AFTER all three must still handshake and receive
      // (trickle defense is deadline-based — see the dedicated test)
      val c = new WsClient(server.boundPort, "dGhlIHNhbXBsZSBub25jZQ==")
      assert(c.handshakeResponse.startsWith("HTTP/1.1 101"))
      awaitUntil()(hub.liveClients.size == 1)
      hub.publish("""{"alive":true}""")
      val (op, p) = c.readFrame()
      assert(op === 0x1 && new String(p, UTF_8) === """{"alive":true}""")
      silent.close()
      noKey.close()
      c.sock.close()
    } finally {
      hub.shutdown()
      server.close()
    }
  }

  test("a trickling handshake hits the absolute deadline, not just SO_TIMEOUT") {
    // one byte every 100 ms satisfies every per-read timeout; only the
    // absolute deadline cuts the peer off (review finding: without it a
    // hostile peer held its thread for hours inside the 16 KiB cap)
    val hub = new FanoutHub()
    val server = new WebSocketFanoutServer(hub, handshakeTimeoutMs = 500)
    try {
      val trickler = new Socket("127.0.0.1", server.boundPort)
      val out = trickler.getOutputStream
      val in = trickler.getInputStream
      // the peer sends a VALID key line up front, then trickles without
      // ever finishing the request: the deadline exit must fail the
      // handshake outright, never parse the truncated request, find the
      // early key, and upgrade the very peer it exists to cut off
      out.write(("GET /feed HTTP/1.1\r\n" +
        "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n").getBytes(UTF_8))
      out.flush()
      val req = "X-Padding: aaaaaaaa\r\n"
      var closed = false
      val start = System.currentTimeMillis()
      var i = 0
      // keep trickling until the server gives up on us (closed socket
      // surfaces as EOF on read or a write failure)
      while (!closed && System.currentTimeMillis() - start < 10000) {
        try {
          out.write(req.charAt(i % req.length))
          out.flush()
          i += 1
          trickler.setSoTimeout(100)
          try { if (in.read() < 0) closed = true }
          catch { case _: java.net.SocketTimeoutException => () }
        } catch { case _: java.io.IOException => closed = true }
      }
      assert(closed, "trickling peer must be cut off by the deadline")
      assert(System.currentTimeMillis() - start < 10000)
      assert(hub.liveClients.isEmpty,
        "a cut-off trickler must never be upgraded/registered")
      // and the server still accepts a healthy client afterwards
      val c = new WsClient(server.boundPort, "dGhlIHNhbXBsZSBub25jZQ==")
      assert(c.handshakeResponse.startsWith("HTTP/1.1 101"))
      c.sock.close()
    } finally {
      hub.shutdown()
      server.close()
    }
  }

  test("sink streams a 200-row multi-partition batch to a TCP client") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // capacity >= batch size: offer can never fail, so delivery of every
    // row is deterministic; the driver still iterates the batch
    // partition-at-a-time (toLocalIterator) rather than collecting it
    val hub = new FanoutHub()
    val server = new SocketFanoutServer(hub)
    val c = new TestClient(server.boundPort)
    awaitUntil()(hub.liveClients.size == 1)

    val mem = MemoryStream[Long](numPartitions = 4)
    val q = FanoutSink.start(mem.toDS().toDF("seq_id"), hub, "fanout-big")
    try {
      mem.addData(0L until 200L)
      q.processAllAvailable()
      awaitUntil()(c.received.size == 200)
      val got = c.received.toArray.map(_.toString).toSet
      assert(got === (0L until 200L).map(i => s"""{"seq_id":$i}""").toSet)
      assert(hub.liveClients.size == 1, "keeping up must not get swept")
    } finally {
      q.stop()
      hub.shutdown()
      server.close()
    }
  }

  test("batch far beyond one queue capacity sweeps the slow client, never stalls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // capacity 8 << 200 rows, and the consumer sleeps per message: the
    // publisher is guaranteed to lap the queue, the slow client is
    // dropped (the designed overflow behavior), and the micro-batch
    // still completes promptly — the driver never buffers the batch nor
    // blocks on the dead consumer
    val hub = new FanoutHub(queueCapacity = 8)
    val delivered = new java.util.concurrent.atomic.AtomicInteger(0)
    hub.register("slowpoke", new FanoutHub.Transport {
      override def send(msg: String): Unit = {
        Thread.sleep(5)
        delivered.incrementAndGet()
      }
    })

    val mem = MemoryStream[Long](numPartitions = 4)
    val q = FanoutSink.start(mem.toDS().toDF("seq_id"), hub, "fanout-slow")
    try {
      mem.addData(0L until 200L)
      q.processAllAvailable() // must return: no stall on the slow client
      awaitUntil()(hub.liveClients.isEmpty)
      assert(delivered.get() < 200, "a lapped consumer cannot see every row")
    } finally {
      q.stop()
      hub.shutdown()
    }
  }

  test("websocket fan-out: handshake, text frames, ping/pong, close sweep") {
    val hub = new FanoutHub()
    val server = new WebSocketFanoutServer(hub)
    try {
      val c = new WsClient(server.boundPort, "dGhlIHNhbXBsZSBub25jZQ==")
      assert(c.handshakeResponse.startsWith("HTTP/1.1 101"))
      assert(c.handshakeResponse.contains(
        "Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="))
      awaitUntil()(hub.liveClients.size == 1)

      // short text frame (7-bit length)
      hub.publish("""{"mmsi":1}""")
      val (op1, p1) = c.readFrame()
      assert(op1 === 0x1)
      assert(new String(p1, UTF_8) === """{"mmsi":1}""")

      // >125-byte payload exercises the 16-bit length path
      val big = "x" * 300
      hub.publish(big)
      val (op2, p2) = c.readFrame()
      assert(op2 === 0x1 && p2.length === 300 &&
        new String(p2, UTF_8) === big)

      // masked client PING comes back as PONG with the same payload
      c.sendFrame(0x9, "hb-7".getBytes(UTF_8))
      val (op3, p3) = c.readFrame()
      assert(op3 === 0xA && new String(p3, UTF_8) === "hb-7")

      // CLOSE is echoed and the client swept from the hub
      c.sendFrame(0x8, Array[Byte](0x03, 0xE8.toByte)) // 1000 normal
      val (op4, _) = c.readFrame()
      assert(op4 === 0x8)
      awaitUntil()(hub.liveClients.isEmpty)
    } finally {
      hub.shutdown()
      server.close()
    }
  }
}
