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

    // R2 compound predicate: the websocket server's moving-vessel filter
    // ((type in 1,2,3 AND sog != 0) OR type 6 OR type 21)
    // (ais_webSocketNmeaServer.py:250).
    "ais_moving_filter" -> ((s, _) =>
      decoded(s).filter(
        (col("d.messageType").isin(1, 2, 3) && col("d.position.sog") =!= 0.0) ||
          col("d.messageType") === 6 || col("d.messageType") === 21)
        .select(col("fx"), col("d.messageType").as("messageType"))),

    // Volume end-to-end: 20k synthetic type-1 sentences -> reassembly ->
    // decode -> TSS membership counts. Deterministic, so the aggregate is
    // frozen as a VALUES oracle — a full-pipeline regression at real
    // decode volume (also the decode-throughput line in BENCH).
    "ais_gold_volume" -> ((s, _) => {
      import s.implicits._
      val lines = s.createDataset(graft.ais.Synth.datalogLines(20000)).toDF("value")
      val decodedVol = graft.jobs.GoldJob.decode(lines)
      val pos = graft.jobs.GoldJob.positions(decodedVol)
      pos.agg(
        count(lit(1)).as("n_positions"),
        count(when(graft.ops.Geo.inTssNorthbound(col("longitude"), col("latitude")), 1))
          .as("n_in_north"),
        count(when(graft.ops.Geo.inTssSouthbound(col("longitude"), col("latitude")), 1))
          .as("n_in_south"),
        countDistinct(col("mmsi")).as("n_vessels"))
    }),
  )

  val oracleSql: Map[String, String] = AisOracles2.oracleSql ++ Map(
    "ais_moving_filter" ->
      """SELECT * FROM (VALUES (0, 1), (1, 3), (4, 6), (7, 21), (12, 6), (13, 6),
         (14, 2), (22, 6), (23, 6)) AS t(fx, messageType)""",
    // frozen from the deterministic generator (see AisVolumeSpec)
    "ais_gold_volume" -> AisVolumeOracle.sql)
}
