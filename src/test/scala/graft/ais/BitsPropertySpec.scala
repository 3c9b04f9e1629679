package graft.ais

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bit kernel (SURVEY §5 item 2): unsigned/signed
  * extraction vs a BigInt reference, 6-bit armor round-trip, checksum XOR.
  * Deterministic seeded-random sampling (the offline cache has no
  * scalatest/scalacheck bridge artifact).
  */
class BitsPropertySpec extends AnyFunSuite {

  private val Armor64 = "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"

  test("uint/sint match BigInt two's-complement reference on random payloads") {
    val rnd = new Random(42)
    for (_ <- 1 to 500) {
      val codes = Array.fill(1 + rnd.nextInt(80))(rnd.nextInt(64))
      val bits = BitVec.fromSixBitCodes(codes)
      val bitStr = codes.map(c => Integer.toBinaryString(c | 64).substring(1)).mkString
      val start = rnd.nextInt(bitStr.length)
      val len = 1 + rnd.nextInt(60)
      val slice = bitStr.substring(start, math.min(start + len, bitStr.length))
      val expU = BigInt(slice, 2).toLong
      assert(bits.uint(start, len) === expU, s"uint($start,$len) of $bitStr")
      val expS = if (slice.charAt(0) == '1') expU - (1L << slice.length) else expU
      assert(bits.sint(start, len) === expS)
    }
  }

  test("empty field raises (reference int('0b') parity)") {
    val bits = BitVec.fromSixBitCodes(Array(1, 2, 3))
    intercept[DecodeException](bits.uint(18, 4))
    intercept[DecodeException](bits.uint(5, 0))
  }

  test("armor encode -> payloadBits round-trips every 6-bit code") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val codes = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(64))
      val payload = codes.map(Armor64(_)).mkString
      val bits = Armor.payloadBits(Seq(payload))
      assert(bits.length === codes.length * 6)
      codes.zipWithIndex.foreach { case (c, i) =>
        assert(bits.uintI(i * 6, 6) === c)
      }
    }
  }

  test("checksum: correct XOR validates, any payload mutation invalidates") {
    val rnd = new Random(99)
    for (_ <- 1 to 200) {
      val payload = Array.fill(5 + rnd.nextInt(40))(Armor64(rnd.nextInt(64))).mkString
      val body = s"ABVDM,1,1,7,A,$payload,0"
      val x = body.foldLeft(0)(_ ^ _.toInt)
      val sentence = f"!$body*$x%02X"
      assert(Armor.checksumValid(sentence))
      val idx = sentence.indexOf(payload) + rnd.nextInt(payload.length)
      val old = sentence.charAt(idx)
      val repl = Armor64((Armor64.indexOf(old) + 1 + rnd.nextInt(62)) % 64)
      if (repl != old) {
        assert(!Armor.checksumValid(sentence.updated(idx, repl)),
          s"mutation $old->$repl at $idx must break checksum")
      }
    }
  }
}
