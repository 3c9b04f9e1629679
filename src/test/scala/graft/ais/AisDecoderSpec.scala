package graft.ais

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-vector decode parity: src/test/resources/golden_ais.json holds
  * the reference decoder's exact output (captured by running the reference
  * on its own fixture sentences plus synthesized coverage sentences for the
  * types the fixtures miss). Every emitted key must match bit-for-bit,
  * including float artifacts (13.200000000000001) and -0.0 ROT.
  */
class AisDecoderSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private lazy val golden: Seq[Map[String, Any]] = {
    val in = getClass.getResourceAsStream("/golden_ais.json")
    val tree = mapper.readValue(in, classOf[java.util.List[java.util.Map[String, Any]]])
    tree.asScala.toSeq.map(_.asScala.toMap)
  }

  /** Flatten AisDecoded the way the reference accretes dicts: common header
    * keys + the non-null branch's fields (None values skipped).
    */
  private def flatten(d: AisDecoded): Map[String, Any] = {
    def product(p: Product): Map[String, Any] =
      p.productElementNames.zip(p.productIterator).flatMap {
        case (_, None) => Nil
        case (k, Some(v: Product)) if !v.isInstanceOf[String] => product(v).toSeq
        case (k, Some(v)) => Seq(k -> v)
        case (k, v: Product) if !v.isInstanceOf[String] => product(v).toSeq
        case (k, v) => Seq(k -> v)
      }.toMap
    product(d)
  }

  private def sameValue(key: String, exp: Any, got: Any): Boolean = (exp, got) match {
    case (e: Number, g: Double) =>
      java.lang.Double.compare(e.doubleValue(), g) == 0
    case (e: Number, g: Number) => e.longValue() == g.longValue()
    case (e: String, g: String) => e == g
    case _ => exp == got
  }

  test("golden corpus decodes with exact parity") {
    var checkedFields = 0
    golden.foreach { entry =>
      val sentences = entry.getOrElse("_sentence", entry("sentence"))
        .asInstanceOf[java.util.List[String]].asScala.toSeq
      val label = entry.getOrElse("_name", sentences.head.take(30)).toString
      if (entry.contains("ERROR")) {
        assert(AisDecoder.decode(sentences).isEmpty,
          s"[$label] reference errored -> decode must be None")
      } else {
        val decoded = AisDecoder.decode(sentences)
        assert(decoded.isDefined, s"[$label] decode returned None")
        val flat = flatten(decoded.get)
        entry.filterNot(_._1.startsWith("_")).foreach { case (k, exp) =>
          assert(flat.contains(k), s"[$label] missing key $k (have ${flat.keys.toSeq.sorted})")
          assert(sameValue(k, exp, flat(k)), s"[$label] $k: expected $exp got ${flat(k)}")
          checkedFields += 1
        }
        // no extra emitted keys beyond package metadata (golden lacks them)
        val extras = flat.keySet -- entry.keySet --
          Set("packageType", "packageID", "packageCh")
        assert(extras.isEmpty, s"[$label] extra keys: $extras")
      }
    }
    info(s"checked $checkedFields fields across ${golden.size} vectors")
    assert(checkedFields > 300)
  }

  test("fragment validation: wrong count, bad checksum, out-of-sequence") {
    val two = Seq(
      "!ABVDM,2,1,9,A,58I3mA82@Es3UKOOGB0l4E9<f1L4hhU>22222217H147I?610K54480CPj3l,0*19",
      "!ABVDM,2,2,9,A,PAiH8888880,2*16")
    assert(AisDecoder.decode(two).isDefined)
    assert(AisDecoder.decode(two.take(1)).isEmpty, "missing fragment")
    assert(AisDecoder.decode(two.reverse).isEmpty, "out of order")
    val corrupt = Seq("!ABVDM,1,1,7,A,15R9eN001n7DHvT13w0TBSM>00Rm,0*55")
    assert(AisDecoder.decode(corrupt).isEmpty, "bad checksum")
    assert(AisDecoder.decode(Nil).isEmpty, "empty group")
  }

  test("six-bit @@@@@ sentinel and trim") {
    // type 24 Part A with all-@ name decodes to "Not available" (golden #13)
    val partA = Seq("!ABVDM,1,1,6,A,H8HtV6QTF0th@D0000000000000,2*6E")
    val d = AisDecoder.decode(partA).get
    assert(d.staticReport.get.shipName.contains("Not available"))
  }

  // --- extended vendor dispatch (reference dead code behind a flag) -----

  private val ArmorTable =
    "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"

  private def synthSentence(nBits: Int, fields: Seq[(Int, Int, Long)]): String = {
    val padded = ((nBits + 5) / 6) * 6
    val bits = new Array[Boolean](padded)
    for ((start, len, value) <- fields; i <- 0 until len)
      bits(start + i) = ((value >>> (len - 1 - i)) & 1L) == 1L
    val payload = bits.grouped(6).map(g =>
      ArmorTable.charAt(g.foldLeft(0)((a, b) => (a << 1) | (if (b) 1 else 0)))).mkString
    val body = s"ABVDM,1,1,0,A,$payload,${padded - nBits}"
    f"!$body*${body.foldLeft(0)(_ ^ _.toInt)}%02X"
  }

  test("extended flag enables DAC200/FID24 water-level country (default off)") {
    // type 8, dac 200, fid 24, country = "MY" (6-bit 13, 25)
    val s = Seq(synthSentence(68, Seq(
      (0, 6, 8L), (8, 30, 533000123L), (40, 10, 200L), (50, 6, 24L),
      (56, 6, 13L), (62, 6, 25L))))
    val plain = AisDecoder.decode(s).get.binaryBroadcast.get
    assert(plain.dac === 200 && plain.fid === 24)
    assert(plain.country.isEmpty, "default must mirror the reference's drop")
    val ext = AisDecoder.decode(s, extended = true).get.binaryBroadcast.get
    assert(ext.country === Some("MY"))
  }

  test("extended flag enables DAC10/FID6 zenilite telemetry (default off)") {
    // type 6, dac 10, fid 6; app_id 1234, voltage 2345, current 678,
    // supply_type 1, light 0, batt_stat 1, off_pos 0
    val s = Seq(synthSentence(130, Seq(
      (0, 6, 6L), (8, 30, 533000456L), (38, 2, 1L), (40, 30, 533000789L),
      (70, 1, 1L), (72, 10, 10L), (82, 6, 6L),
      (88, 16, 1234L), (104, 12, 2345L), (116, 10, 678L),
      (126, 1, 1L), (127, 1, 0L), (128, 1, 1L), (129, 1, 0L))))
    val plain = AisDecoder.decode(s).get.addressed.get
    assert(plain.dac === 10 && plain.fid === 6)
    assert(plain.app_id.isEmpty && plain.voltage.isEmpty,
      "default must mirror the reference's drop")
    val ext = AisDecoder.decode(s, extended = true).get.addressed.get
    assert(ext.app_id === Some(1234) && ext.voltage === Some(2345) &&
      ext.current === Some(678))
    assert(ext.supply_type === Some(1) && ext.light === Some(0) &&
      ext.batt_stat === Some(1) && ext.off_pos === Some(0))
    // and through the native expression path with the flag set
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val row = Seq(Seq(s.head)).toDF("sentences")
      .select(AisDecoder.ais_decode($"sentences", extended = true).as("d"))
      .select($"d.addressed.app_id", $"d.addressed.voltage").head()
    assert(row.getInt(0) === 1234 && row.getInt(1) === 2345)
  }
}
