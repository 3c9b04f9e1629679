package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ais.{AisDecoder, ChecksumFixtures, Fixtures}

/** Per-type AIS decode queries completing E7/E12-E21 coverage: each
  * projects one message family's branch struct and hash-matches the
  * golden VALUES oracle ([[AisOracles2]]).
  */
object Ais2 {
  type Q = (SparkSession, String) => DataFrame

  private def decoded(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.sentenceGroups.toDF("fx", "sentences")
      .withColumn("d", AisDecoder.ais_decode(col("sentences")))
      .filter(col("d").isNotNull)
  }

  /** Select `fields` of branch struct `branch` for message types `types`. */
  private def branchQuery(types: Seq[Int], branch: String, fields: Seq[String]): Q =
    (s, _) => {
      val cols: Seq[Column] =
        col("fx") +: col("d.mmsi").as("mmsi") +:
          fields.map(f => col(s"d.$branch.$f").as(f))
      decoded(s).filter(col("d.messageType").isin(types: _*)).select(cols: _*)
    }

  val queries: Map[String, Q] = Map(
    "ais_basestation" -> branchQuery(Seq(4), "baseStation", Seq(
      "utc_year", "utc_month", "utc_day", "utc_hour", "utc_minute",
      "utc_second", "longitude", "latitude", "epfd", "epfdDesc")),
    "ais_aircraft" -> branchQuery(Seq(9), "aircraft", Seq(
      "altitude", "sog", "longitude", "latitude", "cog", "raimFlag",
      "radioStatus")),
    "ais_classb" -> branchQuery(Seq(18), "classB", Seq(
      "sog", "longitude", "latitude", "cog", "trueHeading", "cs", "band",
      "radioStatus")),
    "ais_classb_ext" -> branchQuery(Seq(19), "classBExt", Seq(
      "shipName", "shipType", "shipTypeDesc", "to_bow", "to_stern",
      "epfd", "epfdDesc", "sog", "longitude", "latitude")),
    "ais_aidnav" -> branchQuery(Seq(21), "aidNav", Seq(
      "aidType", "aidTypeDesc", "aidName", "longitude", "latitude",
      "virtualAid", "off_position", "utc_second")),
    "ais_static_report" -> branchQuery(Seq(24), "staticReport", Seq(
      "partNo", "portNo", "shipName", "shipType", "shipTypeDesc",
      "vendor", "callsign", "to_bow", "serial")),
    "ais_dgnss" -> branchQuery(Seq(17), "dgnss", Seq(
      "longitude", "latitude", "data")),
    "ais_interrogation" -> branchQuery(Seq(15), "interrogation", Seq(
      "mmsi1", "type1_1", "offset1_1", "type1_2", "offset1_2",
      "mmsi2", "type2_1", "offset2_1")),
    "ais_longrange" -> branchQuery(Seq(27), "longRange", Seq(
      "navStatus", "navStatusDesc", "longitude", "latitude", "sog",
      "cog", "gnss", "positionAccuracy")),

    // E1: NMEA checksum validity over every golden sentence + corrupted ones.
    "ais_checksum" -> ((s, _) => {
      import s.implicits._
      ChecksumFixtures.sentences.map { case (fx, sentence, _) => (fx, sentence) }
        .toDF("fx", "sentence")
        .select(col("fx"), AisDecoder.ais_checksum_valid(col("sentence")).as("valid"))
    }),
  )

  val oracleSql: Map[String, String] = AisOracles2.oracleSql
}
