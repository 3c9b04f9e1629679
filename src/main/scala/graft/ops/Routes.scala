package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse routing (SURVEY R9/R10): one decoded stream fans out to four
  * typed tables by message type, with schema alignment for the DAC533
  * telemetry union (ais_egressServerCH.py:138-191, data_transform :23-65).
  *
  * Each route is a filter + projection off the SAME decoded frame — in
  * streaming these become four sinks on one lineage (no re-decode); in
  * batch they are four narrow jobs sharing the scan.
  */
object Routes {

  /** pnav.ais_position route: types 1/2/3 (:138-145). */
  def positionRoute(decoded: DataFrame): DataFrame =
    decoded.filter(col("d.messageType").isin(1, 2, 3)).select(
      col("ts"), col("d.mmsi").as("mmsi"),
      col("d.position.sog").as("sog"), col("d.position.cog").as("cog"),
      col("d.position.rot").as("rot"),
      col("d.position.trueHeading").as("trueHeading"),
      col("d.position.latitude").as("latitude"),
      col("d.position.longitude").as("longitude"))

  /** pnav.ais_static route: type 5 (:147-154). */
  def staticRoute(decoded: DataFrame): DataFrame =
    decoded.filter(col("d.messageType") === 5).select(
      col("ts"), col("d.mmsi").as("mmsi"),
      col("d.staticVoyage.imo").as("imo"),
      col("d.staticVoyage.callsign").as("callsign"),
      col("d.staticVoyage.shipName").as("shipName"),
      col("d.staticVoyage.shipType").as("shipType"),
      col("d.staticVoyage.destination").as("destination"),
      col("d.staticVoyage.draught").as("draught"))

  /** pnav.ais_type21 route (:156-163). */
  def aidNavRoute(decoded: DataFrame): DataFrame =
    decoded.filter(col("d.messageType") === 21).select(
      col("ts"), col("d.mmsi").as("mmsi"),
      col("d.aidNav.aidType").as("aidType"),
      col("d.aidNav.aidName").as("aidName"),
      col("d.aidNav.latitude").as("latitude"),
      col("d.aidNav.longitude").as("longitude"),
      col("d.aidNav.off_position").as("off_position"),
      col("d.aidNav.virtualAid").as("virtualAid"))

  /** pnav.ais_type6_533 route: type 6 with dac=533, fid in (1,2,4)
    * (:165-191). FID2 rows carry two extra zero columns and FID1 rows are
    * remapped by the reference's data_transform (:23-65): lantern_batt ->
    * buoy_led_power, lantern -> buoy_low_vin, hatch_door -> buoy_photocell,
    * everything else zeroed — replicated via aligned projections.
    */
  def telemetryRoute(decoded: DataFrame): DataFrame = {
    val base = decoded.filter(
      col("d.messageType") === 6 && col("d.addressed.dac") === 533 &&
        col("d.addressed.fid").isin(1, 2, 4))
    val a = col("d.addressed")
    def z = lit(0)
    val common = Seq(
      col("ts"), col("d.mmsi").as("mmsi"), a.getField("fid").as("fid"),
      a.getField("volt_int").as("volt_int"), a.getField("volt_ex1").as("volt_ex1"),
      a.getField("volt_ex2").as("volt_ex2"),
      a.getField("off_pos").as("off_pos"), a.getField("ambient").as("ambient"),
      a.getField("racon").as("racon"), a.getField("light").as("light"),
      a.getField("health").as("health"), a.getField("beat").as("beat"))
    val fid4 = base.filter(a.getField("fid") === 4).select(common ++ Seq(
      a.getField("alarm_active").as("alarm_active"),
      a.getField("buoy_led_power").as("buoy_led_power"),
      a.getField("buoy_low_vin").as("buoy_low_vin"),
      a.getField("buoy_photocell").as("buoy_photocell"),
      a.getField("buoy_temp").as("buoy_temp"),
      a.getField("buoy_force_off").as("buoy_force_off")): _*)
    val fid2 = base.filter(a.getField("fid") === 2).select(common ++ Seq(
      z.as("alarm_active"), z.as("buoy_led_power"), z.as("buoy_low_vin"),
      z.as("buoy_photocell"), z.as("buoy_temp"), z.as("buoy_force_off")): _*)
    val fid1 = base.filter(a.getField("fid") === 1).select(common ++ Seq(
      z.as("alarm_active"),
      a.getField("lantern_batt").as("buoy_led_power"),
      a.getField("lantern").as("buoy_low_vin"),
      a.getField("hatch_door").as("buoy_photocell"),
      z.as("buoy_temp"), z.as("buoy_force_off")): _*)
    fid4.unionByName(fid2).unionByName(fid1)
  }
}
