package graft.ais

/** Deterministic synthetic datalog generator for volume/throughput tests:
  * takes the golden type-1 position payload, substitutes mmsi and
  * position bit-fields, re-armors and re-checksums. Pure function of the
  * index — no randomness, so runs are reproducible and distributable
  * (each partition generates its own id range).
  */
object Synth {

  private val ArmorTable = "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"

  /** Set `len` bits at `start` to `value` in a mutable bit array. */
  private def setBits(bits: Array[Boolean], start: Int, len: Int, value: Long): Unit = {
    var i = 0
    while (i < len) {
      bits(start + i) = ((value >>> (len - 1 - i)) & 1L) == 1L
      i += 1
    }
  }

  private def encode(bits: Array[Boolean]): String = {
    val sb = new java.lang.StringBuilder(bits.length / 6)
    var i = 0
    while (i < bits.length) {
      var c = 0
      var b = 0
      while (b < 6) { c = (c << 1) | (if (bits(i + b)) 1 else 0); b += 1 }
      sb.append(ArmorTable.charAt(c))
      i += 6
    }
    sb.toString
  }

  private def withChecksum(body: String): String = {
    var x = 0
    var i = 0
    while (i < body.length) { x ^= body.charAt(i).toInt; i += 1 }
    f"!$body*$x%02X"
  }

  /** One type-1 position sentence for vessel `id`: 168 bits, mmsi and
    * lon/lat vary deterministically over the Malacca bbox, sog/cog vary.
    */
  def positionSentence(id: Long): String = {
    val bits = new Array[Boolean](168)
    setBits(bits, 0, 6, 1)                                   // type 1
    setBits(bits, 8, 30, 200000000L + (id % 100000))         // mmsi
    setBits(bits, 38, 4, id % 9)                             // navStatus
    setBits(bits, 50, 10, (id * 7) % 1023)                   // sog raw
    val lonRaw = ((100.6 + (id % 380) / 100.0) * 600000).toLong
    val latRaw = ((0.9 + ((id * 3) % 260) / 100.0) * 600000).toLong
    setBits(bits, 61, 28, lonRaw)
    setBits(bits, 89, 27, latRaw)
    setBits(bits, 116, 12, (id * 11) % 3600)                 // cog raw
    setBits(bits, 128, 9, id % 360)                          // heading
    withChecksum(s"ABVDM,1,1,${id % 10},A,${encode(bits)},0")
  }

  /** One type-5 static sentence (single-fragment 424-bit variant is not
    * valid AIVDM framing; reuse the golden 2-fragment payload but patch
    * the mmsi of fragment 1 so as-of joins have matches). For volume runs
    * we emit static rows sparsely (1 per `staticEvery` positions).
    */
  def datalogLines(n: Int, baseEpoch: Long = 1673222400L): Seq[String] =
    (0 until n).map { i =>
      val epoch = baseEpoch + i
      s"\\s:stn,q:u,c:$epoch*00" + positionSentence(i.toLong)
    }
}
