package graft.streaming

import java.io.IOException
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** S4/S5 fan-out egress (ais_ingressServer.py:174-220 TCP re-broadcast;
  * ais_webSocketServer.py:143-183 / ais_webSocketServerDb.py:306-347
  * websocket JSON push): every published message goes to every live
  * client; each client has its OWN bounded queue drained by its own
  * worker, so one slow consumer never stalls the feed; a client whose
  * transport fails — or whose queue overflows — is dropped, exactly the
  * reference's dead-client sweep. The transport is pluggable: the TCP
  * line server below, a websocket frame writer, or a test double.
  */
object FanoutHub {
  trait Transport {
    @throws[IOException] def send(msg: String): Unit
    def close(): Unit = ()
  }
}

class FanoutHub(queueCapacity: Int = 1024) {
  import FanoutHub.Transport

  private final class Client(val id: String, transport: Transport) {
    val queue = new ArrayBlockingQueue[String](queueCapacity)
    @volatile var dead = false
    val worker = new Thread(() => {
      try {
        while (!dead) {
          val m = queue.poll(100, TimeUnit.MILLISECONDS)
          if (m != null) transport.send(m)
        }
      } catch {
        case _: IOException | _: InterruptedException => drop(id)
      } finally transport.close()
    }, s"fanout-client-$id")
    worker.setDaemon(true)
  }

  private val clients = new ConcurrentHashMap[String, Client]()

  def register(id: String, transport: Transport): Unit = {
    val c = new Client(id, transport)
    clients.put(id, c)
    c.worker.start()
  }

  def drop(id: String): Unit = {
    val c = clients.remove(id)
    if (c != null) c.dead = true
  }

  def liveClients: Set[String] = clients.keySet().asScala.toSet

  /** Offer to every live client; a full queue means a consumer that
    * stopped keeping up — it is dropped, not waited on (the reference
    * blocks its asyncio queue per-client; a bounded engine can't).
    */
  def publish(msg: String): Unit =
    clients.forEach { (id, c) => if (!c.queue.offer(msg)) drop(id) }

  def shutdown(): Unit = clients.keySet().asScala.toList.foreach(drop)
}

/** S4: TCP re-broadcast shell — accepts raw-socket clients and registers
  * each as a newline-framed transport on the hub.
  */
class SocketFanoutServer(hub: FanoutHub, port: Int = 0) {
  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    var n = 0
    try {
      while (true) {
        val sock = server.accept()
        n += 1
        val out = sock.getOutputStream
        hub.register(s"client-$n", new FanoutHub.Transport {
          override def send(msg: String): Unit = {
            out.write((msg + "\n").getBytes(UTF_8))
            out.flush()
          }
          override def close(): Unit =
            try sock.close() catch { case _: IOException => () }
        })
      }
    } catch { case _: IOException => () } // server closed
  }, "fanout-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = try server.close() catch { case _: IOException => () }
}

/** S5: RFC 6455 websocket shell over the same hub — the reference
  * serves browser clients over real websockets
  * (ais_webSocketServer.py:143-183, ais_webSocketServerDb.py:306-347);
  * this closes the wire-protocol gap the raw-TCP shell left. Scope is
  * the server side of the protocol the reference exercises: the
  * HTTP/1.1 upgrade handshake (Sec-WebSocket-Accept per RFC 6455 §4),
  * unmasked server→client TEXT frames with 7/16/64-bit lengths (§5.2),
  * PING→PONG echo, and CLOSE echo + drop (§5.5). Client→server frames
  * arrive masked and are unmasked for control handling; inbound text is
  * ignored (the reference's push servers never read client data).
  * Per-message deflate, fragmentation, and binary frames are out of
  * scope — the reference never emits them.
  */
object WebSocket {
  private val GuidSuffix = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2 step 5.4). */
  def acceptKey(clientKey: String): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((clientKey.trim + GuidSuffix).getBytes(UTF_8)))

  /** One frame with FIN set, unmasked (server→client). Opcode 0x1 text,
    * 0x8 close, 0x9 ping, 0xA pong.
    */
  def encodeFrame(opcode: Int, payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val header =
      if (n < 126) Array[Byte]((0x80 | opcode).toByte, n.toByte)
      else if (n < 65536) Array[Byte]((0x80 | opcode).toByte, 126.toByte,
        (n >> 8).toByte, n.toByte)
      else Array[Byte]((0x80 | opcode).toByte, 127.toByte,
        0, 0, 0, 0, (n >> 24).toByte, (n >> 16).toByte, (n >> 8).toByte,
        n.toByte)
    header ++ payload
  }

  /** Largest inbound frame accepted: clients only ever send control
    * frames and tiny text here, so anything bigger is a broken or
    * hostile peer — reject rather than allocate.
    */
  val MaxInboundFrameBytes: Long = 1L << 20

  /** Read one client frame (must be masked, RFC 6455 §5.1) from the
    * stream: (opcode, unmasked payload), or None at EOF, on a truncated
    * header (EOF mid-length or mid-mask-key), on an unmasked frame
    * (protocol error per §5.1), or on a length beyond
    * [[MaxInboundFrameBytes]] — every malformed shape maps to None so
    * the caller's single drop path runs.
    */
  def readFrame(in: java.io.InputStream): Option[(Int, Array[Byte])] = {
    def b(): Int = in.read()
    val b0 = b()
    if (b0 < 0) return None
    val opcode = b0 & 0x0F
    val b1 = b()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) {
      val hi = b(); val lo = b()
      if (hi < 0 || lo < 0) return None
      len = ((hi << 8) | lo).toLong
    } else if (len == 127) {
      len = 0L
      var i = 0
      while (i < 8) {
        val x = b()
        if (x < 0) return None
        len = (len << 8) | x
        i += 1
      }
    }
    // negative = a 64-bit length with the top bit set (already illegal
    // per §5.2); the cap also keeps len.toInt below exact
    if (len < 0 || len > MaxInboundFrameBytes) return None
    // RFC 6455 §5.1: a server MUST treat an unmasked client frame as a
    // protocol error — map it to the same drop path as other malformed
    // shapes rather than silently accepting it with a zero mask. Every
    // frame past this point is masked.
    if (!masked) return None
    val mask = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val x = b()
      if (x < 0) return None
      mask(i) = x.toByte
      i += 1
    }
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len.toInt - off)
      if (r < 0) return None
      off += r
    }
    for (j <- payload.indices)
      payload(j) = (payload(j) ^ mask(j & 3)).toByte
    Some((opcode, payload))
  }
}

/** S5: websocket fan-out server — accepts HTTP upgrade requests and
  * registers each client as a text-frame transport on the hub. A
  * per-client reader thread answers PING with PONG and echoes CLOSE
  * before dropping the client (the reference's dead-client sweep);
  * writes from the hub worker and the reader synchronize on the socket
  * output stream so a pong never interleaves mid-frame.
  */
class WebSocketFanoutServer(hub: FanoutHub, port: Int = 0,
    handshakeTimeoutMs: Int = 10000) {
  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  /** Upgrade-request header cap: a peer that streams bytes without ever
    * sending the blank line is cut off rather than growing the buffer.
    */
  private val MaxHandshakeBytes = 16 * 1024

  private def handshake(sock: java.net.Socket): Boolean = {
    val in = sock.getInputStream
    // read header bytes up to the blank line (HTTP/1.1 upgrade request).
    // ABSOLUTE deadline, not just the per-read SO_TIMEOUT: a peer
    // trickling one byte per 9 s would satisfy every individual read
    // and hold its thread for hours otherwise (review finding)
    val deadline = System.nanoTime() + handshakeTimeoutMs * 1000000L
    val sb = new StringBuilder
    var done = false
    var complete = false
    while (!done) {
      val c = in.read()
      if (c < 0 || sb.length >= MaxHandshakeBytes ||
        System.nanoTime() > deadline) done = true
      else {
        sb.append(c.toChar)
        complete = sb.endsWith("\r\n\r\n")
        done = complete
      }
    }
    // deadline / EOF / cap exits fail UNCONDITIONALLY — parsing the
    // truncated request could find a key the peer sent early and
    // upgrade the very trickler the deadline exists to cut off
    // (review finding)
    if (!complete) {
      try sock.close() catch { case _: IOException => () }
      return false
    }
    val key = sb.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
    key match {
      case Some(k) =>
        val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${WebSocket.acceptKey(k)}\r\n\r\n"
        sock.getOutputStream.write(resp.getBytes(UTF_8))
        sock.getOutputStream.flush()
        true
      case None =>
        sock.getOutputStream.write(
          "HTTP/1.1 400 Bad Request\r\n\r\n".getBytes(UTF_8))
        sock.close()
        false
    }
  }

  // The acceptor does NOTHING but accept — all client I/O (handshake
  // included) lives on the per-client thread, so one peer disconnecting
  // mid-handshake or stalling before its headers can neither kill the
  // accept loop nor block other clients (the raw-TCP shell's invariant,
  // held here too).
  private val acceptor = new Thread(() => {
    var n = 0
    try {
      while (true) {
        val sock = server.accept()
        n += 1
        val id = s"ws-client-$n"
        val reader = new Thread(() => {
          try {
            sock.setSoTimeout(handshakeTimeoutMs)
            if (handshake(sock)) {
              sock.setSoTimeout(0)
              val out = sock.getOutputStream
              hub.register(id, new FanoutHub.Transport {
                override def send(msg: String): Unit = out.synchronized {
                  out.write(WebSocket.encodeFrame(0x1, msg.getBytes(UTF_8)))
                  out.flush()
                }
                override def close(): Unit =
                  try sock.close() catch { case _: IOException => () }
              })
              // control-frame loop: PING -> PONG, CLOSE -> echo + drop
              var live = true
              while (live) WebSocket.readFrame(sock.getInputStream) match {
                case Some((0x9, p)) => out.synchronized {
                  out.write(WebSocket.encodeFrame(0xA, p)); out.flush()
                }
                case Some((0x8, p)) =>
                  out.synchronized {
                    out.write(WebSocket.encodeFrame(0x8, p)); out.flush()
                  }
                  live = false
                  hub.drop(id)
                case Some(_) => () // inbound text/pong: push server ignores
                case None => live = false; hub.drop(id)
              }
            }
          } catch {
            // NonFatal, not just IOException: a malformed frame can fail
            // outside the socket layer and the sweep must still run
            case scala.util.control.NonFatal(_) => hub.drop(id)
          } finally {
            try sock.close() catch { case _: IOException => () }
          }
        }, s"ws-reader-$id")
        reader.setDaemon(true)
        reader.start()
      }
    } catch { case _: IOException => () } // server closed
  }, "ws-fanout-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = try server.close() catch { case _: IOException => () }
}

/** S5-shaped sink: stream -> JSON lines -> hub fan-out. foreachBatch
  * hands the (edge-sized, post-aggregation) batch to the driver where
  * the client connections live — the reference's egress servers are
  * exactly this single-process fan-out. The wide path at 100 TB is S8's
  * partitioned parquet / S6's warehouse sinks; this is the live-push
  * edge.
  */
object FanoutSink {
  def start(df: DataFrame, hub: FanoutHub, queryName: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = df.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // toLocalIterator, not collect: the driver holds at most one
        // partition of the micro-batch at a time, so a burst batch can't
        // OOM the driver heap. Costs one job per partition — fine at the
        // edge-sized batches this sink exists for.
        batch.toJSON.toLocalIterator().asScala.foreach(hub.publish)
      }
    checkpointLocation.fold(w)(w.option("checkpointLocation", _)).start()
  }
}
