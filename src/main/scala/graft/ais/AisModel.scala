package graft.ais

/** Decoded AIS message model: one wide union struct with a nested sub-struct
  * per message family, field names matching the reference's emitted dict
  * keys one-for-one (SURVEY §2.2 E5–E21). Per message, exactly one
  * sub-struct is non-null — silver tables are projections of these structs,
  * so Parquet nested-schema pruning keeps scans narrow at scale.
  */

/** Types 1/2/3 (ref: ais_parser.py:34-73). */
final case class Position(
    navStatus: Int, navStatusDesc: String,
    rot: Double, sog: Double,
    positionAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double,
    cog: Double, trueHeading: Int, timeStamp: Int, manoeuvre: Int,
    raimFlag: Int, radioStatus: Int,
    syncState: Int, syncStateDesc: String,
    slotTimeout: Int, slotTimeoutDesc: String,
    subMessage: Int)

/** Type 4 (ref: ais_parser.py:76-110). */
final case class BaseStation(
    utc_year: Int, utc_month: Int, utc_day: Int,
    utc_hour: Int, utc_minute: Int, utc_second: Int,
    fixQualityAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double,
    epfd: Int, epfdDesc: String,
    raimFlag: Int, radioStatus: Int,
    syncState: Int, syncStateDesc: String,
    slotTimeout: Int, slotTimeoutDesc: String,
    subMessage: Int)

/** Type 5 (ref: ais_parser.py:113-141). */
final case class StaticVoyage(
    aisVersion: Int, imo: Int,
    callsign: String, shipName: String,
    shipType: Int, shipTypeDesc: String,
    to_bow: Int, to_stern: Int, to_port: Int, to_starboard: Int,
    epfd: Int,
    eta_month: Int, eta_day: Int, eta_hour: Int, eta_minute: Int,
    draught: Double, destination: String, dte: Int)

/** Type 6 header + vendor AtoN telemetry union
  * (ref: ais_parser.py:365-415; vendor parsers :224-347).
  * Only the fields of the matching (dac, fid) branch are set.
  */
final case class Addressed(
    seqno: Int, dest_mmsi: Int, retransmit: Int, dac: Int, fid: Int,
    // DAC133/FID13 tank telemetry (:224-245)
    empty: Option[Int] = None, full: Option[Int] = None, actual: Option[Int] = None,
    supply: Option[Int] = None, half: Option[Int] = None, case_cover: Option[Int] = None,
    battery: Option[Double] = None, sonar: Option[Int] = None, hoppers: Option[Int] = None,
    hopper1: Option[Int] = None, hopper2: Option[Int] = None, hopper3: Option[Int] = None,
    hopper4: Option[Int] = None, hopper5: Option[Int] = None, hopper6: Option[Int] = None,
    hopper7: Option[Int] = None, hopper8: Option[Int] = None,
    // shared vendor fields (DAC250/10, 533/1+235/10, 533/2, 533/4)
    volt_int: Option[Double] = None, volt_ex1: Option[Double] = None, volt_ex2: Option[Double] = None,
    racon: Option[Int] = None, light: Option[Int] = None, health: Option[Int] = None,
    beat: Option[Int] = None, off_pos: Option[Int] = None, ambient: Option[Int] = None,
    hatch_door: Option[Int] = None,
    // DAC250/FID10 lighthouse ext bits (:327-347)
    stat_ext7: Option[Int] = None, stat_ext6: Option[Int] = None, stat_ext5: Option[Int] = None,
    stat_ext4: Option[Int] = None, stat_ext3: Option[Int] = None, stat_ext2: Option[Int] = None,
    stat_ext1: Option[Int] = None, stat_ext0: Option[Int] = None,
    // DAC533/FID1 + DAC235/FID10 light beacon (:248-264)
    lantern_batt: Option[Int] = None, lantern: Option[Int] = None,
    // DAC533/FID2 renewable energy (:266-293)
    main_lantern_cond: Option[Int] = None, main_lantern_stat: Option[Int] = None,
    stdby_lantern_cond: Option[Int] = None, stdby_lantern_stat: Option[Int] = None,
    emerg_lantern_cond: Option[Int] = None, emerg_lantern_stat: Option[Int] = None,
    opticA_drive_stat: Option[Int] = None, opticA_drive_cond: Option[Int] = None,
    opticB_drive_stat: Option[Int] = None, opticB_drive_cond: Option[Int] = None,
    main_power: Option[Int] = None, bms_cond: Option[Int] = None,
    // DAC533/FID4 buoy (:295-324)
    alarm_active: Option[Int] = None, buoy_led_power: Option[Int] = None,
    buoy_low_vin: Option[Int] = None, buoy_photocell: Option[Int] = None,
    buoy_temp: Option[Int] = None, buoy_force_off: Option[Int] = None,
    buoy_islight: Option[Int] = None, buoy_errled_short: Option[Int] = None,
    buoy_errled_open: Option[Int] = None, buoy_errled_voltlow: Option[Int] = None,
    buoy_errled_vinlow: Option[Int] = None, buoy_errled_power: Option[Int] = None,
    buoy_adjmaxpower: Option[Int] = None, buoy_sensor_interrupt: Option[Int] = None,
    buoy_solarcharging: Option[Int] = None,
    // DAC10/FID6 zenilite (ais_parser.py:350-361 — dispatch commented out
    // at :384-387; populated only under extended vendor dispatch).
    // `light`/`off_pos` above are shared with the other vendor branches.
    app_id: Option[Int] = None, voltage: Option[Int] = None,
    current: Option[Int] = None, supply_type: Option[Int] = None,
    batt_stat: Option[Int] = None)

/** Type 8 header + DAC1/FID29 text + DAC1/FID31 meteo/hydro
  * (ref: ais_parser.py:420-441, meteo :143-213).
  */
final case class BinaryBroadcast(
    dac: Int, fid: Int,
    linkId: Option[Int] = None, text: Option[String] = None,
    longitude: Option[Double] = None, latitude: Option[Double] = None,
    positionAccuracy: Option[Int] = None, positionAccuracyDesc: Option[String] = None,
    utc_day: Option[Int] = None, utc_hour: Option[Int] = None, utc_minute: Option[Int] = None,
    avgWindSpeed: Option[Int] = None, windGust: Option[Int] = None,
    windDirection: Option[Int] = None, windGustDirection: Option[Int] = None,
    airTemperature: Option[Int] = None, relativeHumidity: Option[Int] = None,
    dewpoint: Option[Int] = None, airPressure: Option[Int] = None,
    airPressureTendency: Option[Int] = None, airPressureTendencyDesc: Option[String] = None,
    horizontalVisibility: Option[Int] = None,
    waterLevel: Option[Int] = None, waterLevelTrend: Option[Int] = None,
    waterLevelTrendDesc: Option[String] = None,
    surfaceCurrentSpeed: Option[Int] = None, surfaceCurrentDirection: Option[Int] = None,
    surfaceCurrentSpeed_2: Option[Int] = None, surfaceCurrentDirection_2: Option[Int] = None,
    CurrentMeasureLevel_2: Option[Int] = None,
    surfaceCurrentSpeed_3: Option[Int] = None, surfaceCurrentDirection_3: Option[Int] = None,
    CurrentMeasureLevel_3: Option[Int] = None,
    significantWaveHeight: Option[Int] = None, wavePeriod: Option[Int] = None,
    waveDirection: Option[Int] = None,
    swellHeight: Option[Int] = None, swellPeriod: Option[Int] = None,
    swellDirection: Option[Int] = None,
    seaState: Option[Int] = None, seaStateDesc: Option[String] = None,
    waterTemperature: Option[Int] = None,
    precipitation: Option[Int] = None, precipitationDesc: Option[String] = None,
    salinity: Option[Int] = None, ice: Option[Int] = None, iceDesc: Option[String] = None,
    // DAC200/FID24 water level (ais_parser.py:216-221 — dispatch commented
    // out at :437-439; populated only under extended vendor dispatch)
    country: Option[String] = None)

/** Type 9 (ref: ais_parser.py:445-472). */
final case class Aircraft(
    altitude: Int, sog: Double,
    positionAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double, cog: Double,
    timeStamp: Int, regional: Int, dte: Int, assigned: Int,
    raimFlag: Int, radioStatus: Int,
    syncState: Int, syncStateDesc: String,
    slotTimeout: Int, slotTimeoutDesc: String,
    subMessage: Int)

/** Types 12/14 (ref: ais_parser.py:475-492); type 14 has text only. */
final case class SafetyText(
    seqNo: Option[Int] = None, dest_mmsi: Option[Int] = None, retransmit: Option[Int] = None,
    text: String)

/** Type 15 (ref: ais_parser.py:496-510). */
final case class Interrogation(
    mmsi1: Int, type1_1: Int, offset1_1: Int,
    type1_2: Int, offset1_2: Int,
    mmsi2: Int, type2_1: Int, offset2_1: Int)

/** Type 17 — lon/lat intentionally UNSCALED ints (ref: ais_parser.py:528-537). */
final case class Dgnss(longitude: Long, latitude: Long, data: String)

/** Type 18 (ref: ais_parser.py:541-567). */
final case class ClassB(
    reserved: Int, sog: Double,
    positionAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double, cog: Double,
    trueHeading: Int, timeStamp: Int, regional: Int,
    cs: Int, display: Int, dsc: Int, band: Int, msg22: Int,
    assigned: Int, raimFlag: Int, radioStatus: Int)

/** Type 19 (ref: ais_parser.py:571-605). */
final case class ClassBExt(
    reserved: Int, sog: Double,
    positionAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double, cog: Double,
    trueHeading: Int, timeStamp: Int, regional: Int,
    shipName: String, shipType: Int, shipTypeDesc: String,
    to_bow: Int, to_stern: Int, to_port: Int, to_starboard: Int,
    epfd: Int, epfdDesc: String,
    raimFlag: Int, dte: Int, assigned: Int)

/** Type 21 (ref: ais_parser.py:608-642). */
final case class AidNav(
    aidType: Int, aidTypeDesc: String, aidName: String,
    positionAccuracy: Int, positionAccuracyDesc: String,
    longitude: Double, latitude: Double,
    to_bow: Int, to_stern: Int, to_port: Int, to_starboard: Int,
    epfd: Int, epfdDesc: String,
    utc_second: Int, off_position: Int, regional: Int,
    raimFlag: Int, virtualAid: Int, assigned: Int,
    ext_name: Option[String] = None)

/** Type 24, Part A (payload != 168 bits) or Part B (ref: ais_parser.py:646-680). */
final case class StaticReport(
    portNo: Option[Int] = None, shipName: Option[String] = None,
    partNo: Option[Int] = None, shipType: Option[Int] = None, shipTypeDesc: Option[String] = None,
    vendor: Option[String] = None, model: Option[Int] = None, serial: Option[Int] = None,
    callsign: Option[String] = None,
    motherShip_mmsi: Option[Int] = None,
    to_bow: Option[Int] = None, to_stern: Option[Int] = None,
    to_port: Option[Int] = None, to_starboard: Option[Int] = None)

/** Type 27 (ref: ais_parser.py:684-700). */
final case class LongRange(
    positionAccuracy: Int, positionAccuracyDesc: String,
    raimFlag: Int, navStatus: Int, navStatusDesc: String,
    longitude: Double, latitude: Double,
    sog: Double, cog: Double, gnss: Int)

/** The union record: package metadata + common header + one non-null branch.
  * (package metadata from the LAST fragment, matching ais_analysis.py:250-262.)
  */
final case class AisDecoded(
    packageType: String, packageID: Int, packageCh: String,
    messageType: Int, messageTypeDesc: String, repeat: Int, mmsi: Long,
    position: Option[Position] = None,
    baseStation: Option[BaseStation] = None,
    staticVoyage: Option[StaticVoyage] = None,
    addressed: Option[Addressed] = None,
    binaryBroadcast: Option[BinaryBroadcast] = None,
    aircraft: Option[Aircraft] = None,
    safety: Option[SafetyText] = None,
    interrogation: Option[Interrogation] = None,
    dgnss: Option[Dgnss] = None,
    classB: Option[ClassB] = None,
    classBExt: Option[ClassBExt] = None,
    aidNav: Option[AidNav] = None,
    staticReport: Option[StaticReport] = None,
    longRange: Option[LongRange] = None)
