package graft.ais

/** NMEA sentence mechanics: checksum, field split, 6-bit armoring.
  * (ref: ais_analysis.py:143-167, :255-263)
  */
object Armor {

  /** The AIVDM 6-bit armoring alphabet (ref: ais_analysis.py:157). */
  private val ArmorTable = "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"

  /** char -> 6-bit code; -1 = not in alphabet. */
  private val CharToCode: Array[Int] = {
    val t = Array.fill(128)(-1)
    var i = 0
    while (i < ArmorTable.length) { t(ArmorTable.charAt(i)) = i; i += 1 }
    t
  }

  /** NMEA checksum: XOR of chars strictly between '!' (index 0) and the
    * first '*' equals the hex byte after '*' (ref: ais_analysis.py:143-153).
    * A sentence without '*' is invalid (reference raises).
    */
  def checksumValid(sentence: String): Boolean = {
    val star = sentence.indexOf('*')
    if (star < 0) throw new DecodeException("no checksum delimiter")
    var x = 0
    var i = 1
    while (i < star) { x ^= sentence.charAt(i).toInt; i += 1 }
    val hex = sentence.substring(star + 1)
    x == Integer.parseInt(hex.trim, 16)
  }

  /** Sentence metadata (ref: ais_analysis.py:255-263). */
  final case class Sentence(
      packageType: String,
      totalPackage: Int,
      packageNo: Int,
      packageId: Int,
      channel: String,
      payload: String,
      raw: String)

  def parseSentence(raw: String): Sentence = {
    val f = raw.split(",", -1)
    if (f.length < 7) throw new DecodeException(s"short sentence: $raw")
    Sentence(
      packageType = f(0),
      totalPackage = f(1).toInt,
      packageNo = f(2).toInt,
      packageId = if (f(3).isEmpty) 0 else f(3).toInt,
      channel = f(4),
      payload = f(5),
      raw = raw)
  }

  /** Concatenate all fragments' payloads into one BitVec, 6 bits per char
    * (ref: ais_analysis.py:156-167). Fill bits are NOT removed — the
    * reference keeps them, and the fixed bit offsets of every parser are
    * relative to the unpadded prefix, so trailing fill is harmless.
    * An out-of-alphabet char is an error (reference: ValueError).
    */
  def payloadBits(payloads: Seq[String]): BitVec = {
    var n = 0
    payloads.foreach(p => n += p.length)
    val codes = new Array[Int](n)
    var k = 0
    payloads.foreach { p =>
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val code = if (c < 128) CharToCode(c) else -1
        if (code < 0) throw new DecodeException(s"bad armor char '$c'")
        codes(k) = code
        k += 1
        i += 1
      }
    }
    BitVec.fromSixBitCodes(codes)
  }
}
