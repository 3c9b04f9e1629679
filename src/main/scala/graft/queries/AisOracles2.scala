package graft.queries

/** Per-type AIS decode oracles (VALUES literals frozen from the reference
  * decoder's golden outputs) + the checksum-validity oracle.
  * GENERATED from src/test/resources/golden_ais.json — do not hand-edit.
  */
object AisOracles2 {
  val oracleSql: Map[String, String] = Map(
    "ais_basestation" ->
      "SELECT * FROM (VALUES (CAST(2 AS INTEGER), CAST(5330175 AS BIGINT), CAST(2023 AS INTEGER), CAST(12 AS INTEGER), CAST(12 AS INTEGER), CAST(3 AS INTEGER), CAST(3 AS INTEGER), CAST(0 AS INTEGER), CAST('100.60093' AS DOUBLE), CAST('4.1558866666666665' AS DOUBLE), CAST(7 AS INTEGER), 'Surveyed')) AS t(fx, mmsi, utc_year, utc_month, utc_day, utc_hour, utc_minute, utc_second, longitude, latitude, epfd, epfdDesc)",
    "ais_aircraft" ->
      "SELECT * FROM (VALUES (CAST(6 AS INTEGER), CAST(2035 AS BIGINT), CAST(174 AS INTEGER), CAST('0.0' AS DOUBLE), CAST('101.549415' AS DOUBLE), CAST('3.1255083333333333' AS DOUBLE), CAST('0.0' AS DOUBLE), CAST(0 AS INTEGER), CAST(67779 AS INTEGER))) AS t(fx, mmsi, altitude, sog, longitude, latitude, cog, raimFlag, radioStatus)",
    "ais_classb" ->
      "SELECT * FROM (VALUES (CAST(9 AS INTEGER), CAST(563009060 AS BIGINT), CAST('0.0' AS DOUBLE), CAST('103.60714333333334' AS DOUBLE), CAST('1.25723' AS DOUBLE), CAST('0.0' AS DOUBLE), CAST(511 AS INTEGER), CAST(1 AS INTEGER), CAST(1 AS INTEGER), CAST(917510 AS INTEGER))) AS t(fx, mmsi, sog, longitude, latitude, cog, trueHeading, cs, band, radioStatus)",
    "ais_classb_ext" ->
      "SELECT * FROM (VALUES (CAST(8 AS INTEGER), CAST(533384803 AS BIGINT), 'PAF 4803 F', CAST(30 AS INTEGER), 'Fishing', CAST(21 AS INTEGER), CAST(10 AS INTEGER), CAST(0 AS INTEGER), 'Undefined default', CAST('2.1' AS DOUBLE), CAST('103.98976666666667' AS DOUBLE), CAST('3.11694' AS DOUBLE))) AS t(fx, mmsi, shipName, shipType, shipTypeDesc, to_bow, to_stern, epfd, epfdDesc, sog, longitude, latitude)",
    "ais_aidnav" ->
      "SELECT * FROM (VALUES (CAST(7 AS INTEGER), CAST(995336007 AS BIGINT), CAST(24 AS INTEGER), 'Port hand Mark', 'TANJUNG SAIMA BUOY', CAST('117.88666666666667' AS DOUBLE), CAST('4.193333333333333' AS DOUBLE), CAST(1 AS INTEGER), CAST(0 AS INTEGER), CAST(60 AS INTEGER))) AS t(fx, mmsi, aidType, aidTypeDesc, aidName, longitude, latitude, virtualAid, off_position, utc_second)",
    "ais_static_report" ->
      "SELECT * FROM (VALUES (CAST(10 AS INTEGER), CAST(533000650 AS BIGINT), CAST(1 AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(60 AS INTEGER), 'Passenger all ships of this type', '@@(', '9 MHU 5', CAST(15 AS INTEGER), CAST(0 AS INTEGER)), (CAST(11 AS INTEGER), CAST(563029530 AS BIGINT), CAST(NULL AS INTEGER), CAST(0 AS INTEGER), 'Not available', CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER))) AS t(fx, mmsi, partNo, portNo, shipName, shipType, shipTypeDesc, vendor, callsign, to_bow, serial)",
    "ais_dgnss" ->
      "SELECT * FROM (VALUES (CAST(19 AS INTEGER), CAST(2734450 AS BIGINT), CAST(-5000 AS BIGINT), CAST(3000 AS BIGINT), 'DGNSSDATA0')) AS t(fx, mmsi, longitude, latitude, data)",
    "ais_interrogation" ->
      "SELECT * FROM (VALUES (CAST(17 AS INTEGER), CAST(3669987 AS BIGINT), CAST(367894000 AS BIGINT), CAST(5 AS INTEGER), CAST(100 AS INTEGER), CAST(24 AS INTEGER), CAST(200 AS INTEGER), CAST(366123456 AS BIGINT), CAST(3 AS INTEGER), CAST(150 AS INTEGER))) AS t(fx, mmsi, mmsi1, type1_1, offset1_1, type1_2, offset1_2, mmsi2, type2_1, offset2_1)",
    "ais_longrange" ->
      "SELECT * FROM (VALUES (CAST(20 AS INTEGER), CAST(236091959 AS BIGINT), CAST(3 AS INTEGER), 'Restricted manoeuverability', CAST('-0.01775' AS DOUBLE), CAST('0.0486' AS DOUBLE), CAST('1.2' AS DOUBLE), CAST('18.3' AS DOUBLE), CAST(0 AS INTEGER), CAST(1 AS INTEGER))) AS t(fx, mmsi, navStatus, navStatusDesc, longitude, latitude, sog, cog, gnss, positionAccuracy)",
    "ais_checksum" ->
      "SELECT * FROM (VALUES (CAST(0 AS INTEGER), true), (CAST(1 AS INTEGER), true), (CAST(2 AS INTEGER), true), (CAST(3 AS INTEGER), true), (CAST(4 AS INTEGER), true), (CAST(5 AS INTEGER), true), (CAST(6 AS INTEGER), true), (CAST(7 AS INTEGER), true), (CAST(8 AS INTEGER), true), (CAST(9 AS INTEGER), true), (CAST(10 AS INTEGER), true), (CAST(11 AS INTEGER), true), (CAST(12 AS INTEGER), true), (CAST(13 AS INTEGER), true), (CAST(14 AS INTEGER), true), (CAST(15 AS INTEGER), true), (CAST(16 AS INTEGER), true), (CAST(17 AS INTEGER), true), (CAST(18 AS INTEGER), true), (CAST(19 AS INTEGER), true), (CAST(20 AS INTEGER), true), (CAST(21 AS INTEGER), true), (CAST(22 AS INTEGER), true), (CAST(23 AS INTEGER), true), (CAST(24 AS INTEGER), true), (CAST(25 AS INTEGER), true), (CAST(26 AS INTEGER), false), (CAST(27 AS INTEGER), false)) AS t(fx, valid)")
}
