package graft.ais

import java.sql.Timestamp
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import scala.xml.{Elem, Node, XML}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVEF (IALA Inter-VTS Exchange Format 0.2.5) track parsing and the
  * latest-track-state store (SURVEY §3.3, E24, R12; ref:
  * ais_ivef_lmt_client.py, ais_ivefParser.py).
  *
  * A MSG_IVEF document carries Header(MsgRefId, Version) +
  * Body/ObjectDatas/ObjectData*; each ObjectData's nested
  * TrackData/Pos/NavStatus/VesselData/VoyageData elements are flattened
  * depth-first into (attribute, value) pairs (ais_ivef_lmt_client.py:
  * 226-245) — `Key`/`Value` attribute pairs re-key (empty key ->
  * "NavStatus"), later duplicates overwrite earlier ones — then coerced
  * into the 74-column Swasla record (:120-207).
  *
  * Replicated reference quirks (observable semantics):
  *  - EstAccLat is assigned eval(Id) and EstAccLong eval(the EstAccLat
  *    attribute) — a transcription slip in the reference ctor (:141-143);
  *  - Flag is annotated, never assigned -> always null (:171);
  *  - a missing UpdateTime crashes the ctor -> record dropped;
  *  - STYRIS_*_FLAG parse as (== "true") (:204,208).
  * Deviation: MMSI is cast to a long column here (the reference passes the
  * raw string to a Postgres INTEGER column, which coerces on insert).
  */
object Ivef {

  final case class Swasla(
      Id: String, MsgRefId: String, Version: String,
      Altitude: Double, EstAccAlt: Double, EstAccLat: Double, EstAccLong: Double,
      Lat: Double, Long: Double, COG: Double, EstAccSOG: Double, EstAccCOG: Double,
      Heading: Double, ROT: Double, SOG: Double,
      UpdateTime: Timestamp, TrackStatus: Int, NavStatus: Int,
      HullColor: Option[String], HullType: Int, DeadWeight: Double,
      GrossWeight: Double, Length: Double, LloydsShipType: Int,
      YearOfBuild: Int, MaxAirDraught: Double, MaxDraught: Double,
      MaxPersonsOnBoard: Int, MaxSpeed: Double, Width: Double,
      Callsign: Option[String], IMO: Long, Name: Option[String],
      FormerName: Option[String], Flag: Option[String], Owner: Option[String],
      MMSI: Long, LRIT: Option[String],
      Class: Int, SpecialAttention: Option[String], SourceId: Option[String],
      SourceName: Option[String], SourceType: Int,
      ATA: Option[Timestamp], ETA: Option[Timestamp], RTA: Option[Timestamp],
      LCode: Option[String],
      AirDraught: Double, CargoTypeIMO: Int, ContactIdentity: Option[String],
      DestCode: Option[String], DestName: Option[String],
      DepartCode: Option[String], DepartName: Option[String],
      Draught: Double, ATD: Option[Timestamp], ISPSLevel: Double,
      OverSizedLength: Double, OverSizedWidth: Double, PersonsOnBoard: Int,
      Pilots: Double,
      STYRIS_INFO_1: Option[String], STYRIS_CREATION_U_DATE: Int,
      STYRIS_ATTENTION_LEVEL: Int, STYRIS_GENERIC_TYPE: Int, STYRIS_TYPE: Int,
      STYRIS_CANCEL_FLAG: Boolean, STYRIS_NGL: Option[String],
      STYRIS_TRACKING_TYPE: Int, STYRIS_SOURCE_TYPE: Int,
      STYRIS_FREE_FLAG: Boolean, STYRIS_CREATION_DATE: Int,
      STYRIS_AFFILIATION: Int, STYRIS_NAV_STATUS: Int,
      STYRIS_COMMENT: Option[String])

  /** Depth-first attribute flatten of one element subtree, replicating
    * xmltodict ordering (attributes of an element before its children) and
    * the Key/Value re-keying rule. Later pairs overwrite earlier ones when
    * folded into the map (dict-update semantics).
    */
  private[ais] def flatten(node: Node): Seq[(String, String)] = {
    val buf = Seq.newBuilder[(String, String)]
    def walk(n: Node): Unit = n match {
      case e: Elem =>
        var key = ""
        // scala-xml reverses attribute order vs document; restore it
        e.attributes.toSeq.reverse.foreach { a =>
          a.key match {
            case "Key" => key = a.value.text
            case "Value" =>
              buf += ((if (key.isEmpty) "NavStatus" else key) -> a.value.text)
            case k => buf += (k -> a.value.text)
          }
        }
        e.child.foreach(walk)
      case _ => ()
    }
    walk(node)
    buf.result()
  }

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXX")

  private def ts(s: String): Timestamp =
    Timestamp.from(OffsetDateTime.parse(s, TsFmt).toInstant)

  /** ast.literal_eval on a numeric string -> double. */
  private def num(m: Map[String, String], k: String, dflt: String = "0.0"): Double =
    m.getOrElse(k, dflt).toDouble

  private def int(m: Map[String, String], k: String, dflt: String = "0"): Int =
    m.getOrElse(k, dflt).toDouble.toInt

  private def str(m: Map[String, String], k: String): Option[String] = m.get(k)

  private def optTs(m: Map[String, String], k: String): Option[Timestamp] =
    m.get(k).map(ts)

  /** Build one Swasla record from flattened pairs; None when the reference
    * ctor would raise (e.g. missing UpdateTime).
    */
  private[ais] def toSwasla(pairs: Seq[(String, String)], msgRefId: String,
      version: String): Option[Swasla] =
    try {
      val m = pairs.toMap // later pairs overwrite earlier — dict semantics
      Some(Swasla(
        Id = m("Id"), MsgRefId = msgRefId, Version = version,
        Altitude = num(m, "Altitude"), EstAccAlt = num(m, "EstAccAlt"),
        EstAccLat = m("Id").toDouble,                  // reference quirk
        EstAccLong = num(m, "EstAccLat"),              // reference quirk
        Lat = num(m, "Lat"), Long = num(m, "Long"), COG = num(m, "COG"),
        EstAccSOG = num(m, "EstAccSOG"), EstAccCOG = num(m, "EstAccCOG"),
        Heading = num(m, "Heading"), ROT = num(m, "ROT"), SOG = num(m, "SOG"),
        UpdateTime = ts(m("UpdateTime")),
        TrackStatus = int(m, "TrackStatus"), NavStatus = int(m, "NavStatus"),
        HullColor = str(m, "HullColor"), HullType = int(m, "HullType"),
        DeadWeight = num(m, "DeadWeight"), GrossWeight = num(m, "GrossWeight"),
        Length = num(m, "Length"), LloydsShipType = int(m, "LloydsShipType"),
        YearOfBuild = int(m, "YearOfBuild"),
        MaxAirDraught = num(m, "MaxAirDraught"), MaxDraught = num(m, "MaxDraught"),
        MaxPersonsOnBoard = int(m, "MaxPersonsOnBoard"),
        MaxSpeed = num(m, "MaxSpeed"), Width = num(m, "Width"),
        Callsign = str(m, "Callsign"), IMO = m.getOrElse("IMO", "0").toLong,
        Name = str(m, "Name"), FormerName = str(m, "FormerName"),
        Flag = None,                                   // reference quirk
        Owner = str(m, "Owner"),
        MMSI = m.getOrElse("MMSI", "0").toLong, LRIT = str(m, "LRIT"),
        Class = int(m, "Class"), SpecialAttention = str(m, "SpecialAttention"),
        SourceId = str(m, "SourceId"), SourceName = str(m, "SourceName"),
        SourceType = int(m, "SourceType"),
        ATA = optTs(m, "ATA"), ETA = optTs(m, "ETA"), RTA = optTs(m, "RTA"),
        LCode = str(m, "LCode"),
        AirDraught = num(m, "AirDraught"), CargoTypeIMO = int(m, "CargoTypeIMO"),
        ContactIdentity = str(m, "ContactIdentity"),
        DestCode = str(m, "DestCode"), DestName = str(m, "DestName"),
        DepartCode = str(m, "DepartCode"), DepartName = str(m, "DepartName"),
        Draught = num(m, "Draught"), ATD = optTs(m, "ATD"),
        ISPSLevel = num(m, "ISPSLevel"),
        OverSizedLength = num(m, "OverSizedLength"),
        OverSizedWidth = num(m, "OverSizedWidth"),
        PersonsOnBoard = int(m, "PersonsOnBoard"), Pilots = num(m, "Pilots"),
        STYRIS_INFO_1 = str(m, "STYRIS_INFO_1"),
        STYRIS_CREATION_U_DATE = int(m, "STYRIS_CREATION_U_DATE"),
        STYRIS_ATTENTION_LEVEL = int(m, "STYRIS_ATTENTION_LEVEL"),
        STYRIS_GENERIC_TYPE = int(m, "STYRIS_GENERIC_TYPE"),
        STYRIS_TYPE = int(m, "STYRIS_TYPE"),
        STYRIS_CANCEL_FLAG = m.getOrElse("STYRIS_CANCEL_FLAG", "") == "true",
        STYRIS_NGL = str(m, "STYRIS_NGL"),
        STYRIS_TRACKING_TYPE = int(m, "STYRIS_TRACKING_TYPE"),
        STYRIS_SOURCE_TYPE = int(m, "STYRIS_SOURCE_TYPE"),
        STYRIS_FREE_FLAG = m.getOrElse("STYRIS_FREE_FLAG", "") == "true",
        STYRIS_CREATION_DATE = int(m, "STYRIS_CREATION_DATE"),
        STYRIS_AFFILIATION = int(m, "STYRIS_AFFILIATION"),
        STYRIS_NAV_STATUS = int(m, "STYRIS_NAV_STATUS"),
        STYRIS_COMMENT = str(m, "STYRIS_COMMENT")))
    } catch {
      case _: NoSuchElementException | _: NumberFormatException |
           _: java.time.format.DateTimeParseException => None
    }

  /** Parse one MSG_IVEF document into Swasla records (one per ObjectData). */
  def parseDoc(xmlText: String): Seq[Swasla] =
    try {
      val root = XML.loadString(xmlText)
      val header = (root \ "Header").head
      val msgRefId = header.attribute("MsgRefId")
        .map(_.text.replace("{", "").replace("}", "")).getOrElse("")
      val version = header.attribute("Version").map(_.text).getOrElse("")
      (root \ "Body" \ "ObjectDatas" \ "ObjectData").flatMap { od =>
        toSwasla(flatten(od), msgRefId, version)
      }
    } catch { case _: org.xml.sax.SAXParseException | _: NoSuchElementException => Seq.empty }

  /** Dataset of raw XML documents (column `xml`, with an arrival-order
    * column `seq`) -> parsed Swasla rows carrying `seq`.
    */
  def parse(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("seq").cast("long"), col("xml"))
      .as[(Long, String)]
      .flatMap { case (seq, xml) => parseDoc(xml).map(s => (seq, s)) }
      .toDF("seq", "s")
      .select(col("seq"), col("s.*"))
  }

  /** The upsert fields refreshed on every update for an existing Id
    * (ais_ivef_lmt_client.py:289-313).
    */
  val UpdatedFields: Seq[String] = Seq(
    "Lat", "Long", "COG", "Heading", "ROT", "SOG", "UpdateTime",
    "Name", "MMSI", "IMO", "Callsign",
    "SourceType", "SourceName", "TrackStatus", "NavStatus", "Class")

  /** Batch replay of the reference's insert-or-update: per Id the FIRST
    * arrival supplies every column, and each later arrival overwrites only
    * [[UpdatedFields]] — so the final table is first-row fields + last-row
    * kinematics. One shuffle on Id; two ordered windows share the sort.
    */
  def replayUpserts(parsed: DataFrame): DataFrame = {
    val wAsc = Window.partitionBy(col("Id")).orderBy(col("seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cols = parsed.columns.filterNot(_ == "seq").map {
      case c if UpdatedFields.contains(c) =>
        last(col(c), ignoreNulls = false).over(wAsc).as(c)
      case c => first(col(c), ignoreNulls = false).over(wAsc).as(c)
    }
    parsed
      .select((col("seq") +: cols.toSeq): _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("Id")).orderBy(col("seq").asc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "seq")
  }
}
