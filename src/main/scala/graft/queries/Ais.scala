package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ais.{AisDecoder, Fixtures}

/** AIS decode queries (SURVEY §2.2 E1–E26): the decode kernel driven
  * through the DataFrame API over the fixture corpus, verified against
  * VALUES-literal oracles frozen from the reference decoder's output
  * ([[AisOracles]]).
  *
  * The corpus is embedded (there is no AIS table in the driver testdata);
  * at scale the same `ais_decode` column runs over
  * `spark.read.text(datalog)` — see graft.jobs.GoldJob.
  */
object Ais {
  type Q = (SparkSession, String) => DataFrame

  /** Fixture sentence groups as a DataFrame (fx, sentences). */
  private def fixtures(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.sentenceGroups.toDF("fx", "sentences")
  }

  /** Decoded fixtures: fx + the full union struct d (nulls dropped —
    * checksum/sequence/type-16 failures decode to null).
    */
  private def decoded(s: SparkSession): DataFrame =
    fixtures(s)
      .withColumn("d", AisDecoder.ais_decode(col("sentences")))
      .filter(col("d").isNotNull)

  val queries: Map[String, Q] = Map(
    // E5 dispatch: every message type decodes to the right branch.
    "ais_dispatch" -> ((s, _) =>
      decoded(s).select(
        col("fx"), col("d.messageType").as("messageType"),
        col("d.messageTypeDesc").as("messageTypeDesc"), col("d.mmsi").as("mmsi"))),

    // E6: position report fields incl. the ROT quirk (-0.0 at raw 0).
    "ais_position" -> ((s, _) =>
      decoded(s).filter(col("d.messageType").isin(1, 2, 3)).select(
        col("fx"), col("d.mmsi").as("mmsi"),
        col("d.position.navStatus").as("navStatus"),
        col("d.position.navStatusDesc").as("navStatusDesc"),
        col("d.position.rot").as("rot"), col("d.position.sog").as("sog"),
        col("d.position.cog").as("cog"),
        col("d.position.trueHeading").as("trueHeading"),
        col("d.position.longitude").as("longitude"),
        col("d.position.latitude").as("latitude"))),

    // E8: static & voyage (multi-fragment reassembly + 6-bit text).
    "ais_static" -> ((s, _) =>
      decoded(s).filter(col("d.messageType") === 5).select(
        col("fx"), col("d.staticVoyage.imo").as("imo"),
        col("d.staticVoyage.callsign").as("callsign"),
        col("d.staticVoyage.shipName").as("shipName"),
        col("d.staticVoyage.shipType").as("shipType"),
        col("d.staticVoyage.shipTypeDesc").as("shipTypeDesc"),
        col("d.staticVoyage.destination").as("destination"),
        col("d.staticVoyage.draught").as("draught"),
        col("d.staticVoyage.eta_month").as("eta_month"),
        col("d.staticVoyage.eta_day").as("eta_day"),
        col("d.staticVoyage.eta_hour").as("eta_hour"),
        col("d.staticVoyage.eta_minute").as("eta_minute"))),

    // E11: type-6 vendor AtoN telemetry (volt scaling, tank levels).
    "ais_aton" -> ((s, _) =>
      decoded(s).filter(col("d.messageType") === 6).select(
        col("fx"), col("d.addressed.dac").as("dac"), col("d.addressed.fid").as("fid"),
        col("d.addressed.volt_int").as("volt_int"),
        col("d.addressed.volt_ex1").as("volt_ex1"),
        col("d.addressed.volt_ex2").as("volt_ex2"),
        col("d.addressed.battery").as("battery"),
        col("d.addressed.actual").as("actual"),
        col("d.addressed.light").as("light"),
        col("d.addressed.health").as("health"))),

    // E9/E10: type-8 DAC1/FID31 meteo/hydro broadcast.
    "ais_meteo" -> ((s, _) =>
      decoded(s)
        .filter(col("d.messageType") === 8 && col("d.binaryBroadcast.fid") === 31)
        .select(
          col("fx"),
          col("d.binaryBroadcast.longitude").as("longitude"),
          col("d.binaryBroadcast.latitude").as("latitude"),
          col("d.binaryBroadcast.avgWindSpeed").as("avgWindSpeed"),
          col("d.binaryBroadcast.windDirection").as("windDirection"),
          col("d.binaryBroadcast.airTemperature").as("airTemperature"),
          col("d.binaryBroadcast.airPressure").as("airPressure"),
          col("d.binaryBroadcast.seaState").as("seaState"),
          col("d.binaryBroadcast.seaStateDesc").as("seaStateDesc"),
          col("d.binaryBroadcast.waterTemperature").as("waterTemperature"),
          col("d.binaryBroadcast.precipitationDesc").as("precipitationDesc"))),

    // E13: safety-related text (addressed 12 + broadcast 14).
    "ais_safety_text" -> ((s, _) =>
      decoded(s).filter(col("d.messageType").isin(12, 14)).select(
        col("fx"), col("d.safety.seqNo").as("seqNo"),
        col("d.safety.dest_mmsi").as("dest_mmsi"),
        col("d.safety.text").as("text"))),
  )

  val oracleSql: Map[String, String] = AisOracles.oracleSql
}
