package graft.ais

/** Decode failure — mirrors the reference's behavior of raising out of the
  * parser on malformed input (callers drop the message / yield null).
  */
final class DecodeException(msg: String) extends RuntimeException(msg)

/** A bit vector over an AIS payload (6 bits per armored character).
  *
  * Field-extraction semantics replicate the reference bit kernel exactly
  * (ref: ais_parser.py:13-31):
  *  - a field whose range extends past the end of the payload is TRUNCATED
  *    to the available bits (Python slice semantics), and its signedness /
  *    magnitude are computed over the truncated width;
  *  - a field that starts at or past the end is an ERROR (the reference's
  *    `int('0b', 2)` ValueError), surfaced as [[DecodeException]] so the
  *    whole message decodes to null;
  *  - signed fields are two's-complement over the (possibly truncated)
  *    width: value - 2^width if the FIRST bit of the field is set.
  *
  * Backed by a packed little-endian-in-long-words array for scan speed —
  * one `Array[Long]` per message, bit i at word i>>6, bit (63 - (i & 63)).
  */
final class BitVec private (private val words: Array[Long], val length: Int) {

  @inline private def bit(i: Int): Int =
    ((words(i >>> 6) >>> (63 - (i & 63))) & 1L).toInt

  /** Effective width of a field after Python-slice truncation. */
  @inline private def effLen(start: Int, len: Int): Int = {
    val eff = math.min(len, length - start)
    if (eff <= 0 || len <= 0)
      throw new DecodeException(s"empty bit field at $start len $len of $length")
    eff
  }

  /** Unsigned big-endian integer over [start, start+len), truncated. */
  def uint(start: Int, len: Int): Long = {
    val n = effLen(start, len)
    if (n > 63) throw new DecodeException(s"bit field too wide: $n")
    var v = 0L
    var i = start
    val end = start + n
    while (i < end) { v = (v << 1) | bit(i); i += 1 }
    v
  }

  /** Two's-complement signed integer over [start, start+len), truncated. */
  def sint(start: Int, len: Int): Long = {
    val n = effLen(start, len)
    val v = uint(start, len)
    if (bit(start) == 1) v - (1L << n) else v
  }

  def uintI(start: Int, len: Int): Int = uint(start, len).toInt
  def sintI(start: Int, len: Int): Int = sint(start, len).toInt

  /** Remaining bits from `start` to the end (the reference's
    * `len(binaryString[start:])` pattern).
    */
  def rest(start: Int): Int = math.max(length - start, 0)

  /** 6-bit ASCII string (ref: ais_parser.py:18-31): consume 6-bit chunks
    * while at least 6 bits remain in the slice; codes < 32 shift up by 64;
    * a string containing "@@@@@" (pre-trim) becomes "Not available",
    * otherwise surrounding whitespace is stripped.
    */
  def sixBit(start: Int, len: Int): String = {
    val avail = math.max(math.min(len, length - start), 0)
    val sb = new java.lang.StringBuilder(avail / 6)
    var off = start
    var remaining = avail
    while (remaining >= 6) {
      val code = uintI(off, 6)
      sb.append((if (code < 32) code + 64 else code).toChar)
      off += 6
      remaining -= 6
    }
    val raw = sb.toString
    if (raw.contains("@@@@@")) "Not available" else raw.trim
  }
}

object BitVec {

  /** Build from a sequence of 6-bit codes (one per armored payload char). */
  def fromSixBitCodes(codes: Array[Int]): BitVec = {
    val nbits = codes.length * 6
    val words = new Array[Long]((nbits + 63) >>> 6)
    var i = 0
    while (i < codes.length) {
      val base = i * 6
      val c = codes(i)
      var b = 0
      while (b < 6) {
        if (((c >>> (5 - b)) & 1) == 1) {
          val pos = base + b
          words(pos >>> 6) |= (1L << (63 - (pos & 63)))
        }
        b += 1
      }
      i += 1
    }
    new BitVec(words, nbits)
  }
}
