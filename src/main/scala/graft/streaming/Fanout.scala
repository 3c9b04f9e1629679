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

/** S5-shaped sink: stream -> JSON lines -> hub fan-out. foreachBatch
  * hands the (edge-sized, post-aggregation) batch to the driver where
  * the client connections live — the reference's egress servers are
  * exactly this single-process fan-out. The wide path at 100 TB is S8's
  * partitioned parquet / S6's warehouse sinks; this is the live-push
  * edge.
  */
object FanoutSink {
  def start(df: DataFrame, hub: FanoutHub, queryName: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.toJSON.collect().foreach(hub.publish)
      }
      .start()
}
