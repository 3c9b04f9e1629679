package graft.ais

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Decode totality under hostile input: a live NMEA feed at ingest
  * scale WILL deliver corrupt lines, and `AisDecoder.decode` promises
  * None — never an escaped exception crashing the task. Seeded fuzz
  * (same style as BitsPropertySpec): random line noise, checksummed
  * garbage payloads (which get PAST validation into the bit parser for
  * every message type), and mutations/truncations of the golden corpus.
  */
class DecodeFuzzSpec extends AnyFunSuite {

  /** Valid NMEA checksum suffix for a sentence body (between ! and *). */
  private def withChecksum(body: String): String = {
    var x = 0
    body.foreach(c => x ^= c.toInt)
    f"!$body%s*$x%02X"
  }

  private val Armor64 =
    "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"

  test("random line noise never escapes decode as an exception") {
    val rnd = new Random(4242)
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(60)
      val junk = new String(Array.fill(n)((32 + rnd.nextInt(95)).toChar))
      // Option result (Some or None) is the contract; a throw fails
      AisDecoder.decode(Seq(junk))
      AisDecoder.decode(Seq(junk), extended = true)
    }
    AisDecoder.decode(null)
    AisDecoder.decode(Seq.empty)
    AisDecoder.decode(Seq(null))
  }

  test("checksummed garbage payloads exercise every type's bit parser safely") {
    val rnd = new Random(99)
    for (i <- 1 to 2000) {
      // force the type dispatch across all 64 first-chars, rest random:
      // this drives deep into position/static/meteo/telemetry parsing
      // with arbitrary field values, where an unguarded length or
      // index computation would throw
      val first = Armor64.charAt(i % 64)
      val payload = first +:
        Array.fill(rnd.nextInt(90))(Armor64.charAt(rnd.nextInt(64)))
      val body = s"AIVDM,1,1,,A,${new String(payload)},0"
      AisDecoder.decode(Seq(withChecksum(body)))
      AisDecoder.decode(Seq(withChecksum(body)), extended = true)
    }
  }

  test("mutated and truncated golden sentences never escape decode") {
    val rnd = new Random(7)
    val goldenLines = Fixtures.sentenceGroups.flatMap(_._2)
    assert(goldenLines.nonEmpty)
    for (_ <- 1 to 1000) {
      val base = goldenLines(rnd.nextInt(goldenLines.length))
      val mutated = rnd.nextInt(3) match {
        case 0 => base.take(1 + rnd.nextInt(base.length)) // truncate
        case 1 => // flip one char
          val i = rnd.nextInt(base.length)
          base.updated(i, (32 + rnd.nextInt(95)).toChar)
        case _ => // corrupt the payload but keep the checksum VALID so
          // the garbage reaches the bit parser
          val parts = base.stripPrefix("!").split("\\*")(0)
          val i = rnd.nextInt(parts.length)
          withChecksum(parts.updated(i, Armor64.charAt(rnd.nextInt(64))))
      }
      AisDecoder.decode(Seq(mutated))
    }
  }
}
