package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ais.AisDecoder
import graft.operators.AsofJoin
import graft.ops.{Geo, Reassembly}

/** The reference's batch "gold table" pipeline (SURVEY §3.1,
  * ais_analysis.py:308-498 / ais_analysis_polars.py): raw datalog lines ->
  * fragment parse + reassembly -> cheap type peek -> decode -> position &
  * static silver projections -> as-of join (gold) -> TSS zone count.
  *
  * Spark-first shape: everything is one declarative plan; the only
  * hand-written rewrite is the payload-first-char pre-filter before the
  * decode kernel (Catalyst cannot derive filters through an opaque
  * bit-parser expression — SURVEY §4).
  *
  * Scale: reassembly shuffles once on session id (tiny groups), decode is
  * a narrow map, the as-of join shuffles once on mmsi, and the zone count
  * is a codegen'd predicate + partial/final agg. Partition the gold output
  * by date(ts) for downstream pruning.
  */
object GoldJob {

  /** Tag-block event time: 3rd comma field, chars after a 2-char prefix up
    * to '*' are epoch seconds (ais_analysis.py:383-388).
    */
  private def tagTs(tag: org.apache.spark.sql.Column) =
    to_timestamp(from_unixtime(
      regexp_extract(element_at(split(tag, ","), 3), "^.{2}([^*]*)", 1).cast("long")))

  /** Decode a datalog of raw lines (column `value`) into ts + union struct.
    *
    * `peekChars` is the hand-written pushdown from the reference
    * (ais_analysis.py:339-340): the first armored payload char IS the 6-bit
    * message type, so filtering on it skips the expensive decode kernel
    * for unwanted types — Catalyst can't derive this through an opaque
    * expression.
    */
  def decode(lines: DataFrame, peekChars: Seq[String] = Nil): DataFrame =
    decodeAssembled(
      Reassembly.assembleBatch(Reassembly.parseFragments(lines)), peekChars)

  /** The shared peek-filter + decode chain over an assembled frame —
    * one implementation for the batch and streaming paths (the stream
    * used to inline a copy WITHOUT the peek pushdown, running the
    * decode kernel on every message to keep a fraction of them).
    */
  private def decodeAssembled(assembled: DataFrame,
      peekChars: Seq[String]): DataFrame = {
    val peek = substring(element_at(split(element_at(col("sentences"), 1), ","), 6), 1, 1)
    val filtered =
      if (peekChars.nonEmpty) assembled.filter(peek.isin(peekChars: _*))
      else assembled
    filtered
      .withColumn("ts", tagTs(col("tagblock")))
      .withColumn("d", AisDecoder.ais_decode(col("sentences")))
      .filter(col("d").isNotNull)
  }

  /** Position silver projection (types 1/2/3; ais_analysis_polars.py:391-403). */
  def positions(decoded: DataFrame): DataFrame =
    decoded.filter(col("d.messageType").isin(1, 2, 3)).select(
      col("ts"), col("d.messageType").as("messageType"), col("d.mmsi").as("mmsi"),
      col("d.position.sog").as("sog"), col("d.position.cog").as("cog"),
      col("d.position.rot").as("rot"),
      col("d.position.trueHeading").as("trueHeading"),
      col("d.position.latitude").as("latitude"),
      col("d.position.longitude").as("longitude"))

  /** Static silver projection (type 5; ais_analysis_polars.py:361-376). */
  def statics(decoded: DataFrame): DataFrame =
    decoded.filter(col("d.messageType") === 5).select(
      col("ts").as("static_ts"), col("d.mmsi").as("mmsi"),
      col("d.staticVoyage.imo").as("imo"),
      col("d.staticVoyage.callsign").as("callsign"),
      col("d.staticVoyage.shipName").as("shipName"),
      col("d.staticVoyage.shipType").as("shipType"),
      col("d.staticVoyage.destination").as("destination"))

  /** The gold table: positions as-of joined with the latest static row per
    * mmsi (ais_analysis.py:476).
    */
  def gold(decoded: DataFrame): DataFrame = {
    val pos = positions(decoded)
    val stat = statics(decoded)
      .withColumnRenamed("static_ts", "ts")
    AsofJoin.asofJoin(pos, stat, on = "ts", by = Seq("mmsi"),
      rightCols = Seq("imo", "callsign", "shipName", "shipType", "destination"))
  }

  /** Flagship slice: distinct vessels inside TSS-Northbound. */
  def zoneCount(goldDf: DataFrame): DataFrame =
    goldDf
      .filter(Geo.inTssNorthbound(col("longitude"), col("latitude")))
      .agg(countDistinct(col("mmsi")).as("n_vessels"))

  /** Streaming twin of [[run]]: tail a datalog landing zone and keep
    * the date-partitioned gold position table continuously appended.
    * Decode is the same narrow plan; the as-of static join is a BATCH
    * concern (it needs the full static history — the reference also
    * joins at analysis time, ais_analysis.py:476), so the stream lands
    * silver positions and batch `gold` runs over the landed table.
    * Checkpointed file sink => exactly-once appends at 100 TB.
    */
  def runStream(spark: SparkSession, datalogDir: String, goldOut: String,
      checkpointDir: String,
      evictionTimeout: Option[String] = Some("60 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lines = graft.sources.Sources.datalogStream(spark, datalogDir)
    val frags = Reassembly.parseFragments(lines)
    import spark.implicits._
    // evictionTimeout bounds reassembly state: package ids cycle 0-9,
    // so a lost fragment's stale state would otherwise splice with the
    // next message reusing its key. Peek pushdown (types 1/2/3) skips
    // the decode kernel for messages positions() would discard anyway.
    val assembled = Reassembly
      .assembleStream(frags.as[Reassembly.Fragment], evictionTimeout).toDF()
    val decoded = decodeAssembled(assembled, Seq("1", "2", "3"))
    positions(decoded)
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .partitionBy("event_date")
      .option("path", goldOut)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** End-to-end: datalog path -> gold parquet + zone count. The gold
    * table is written partitioned by event date so downstream
    * time-ranged reads prune whole partitions before row-group pruning
    * (SCALE.md scan contract) — at 100 TB a day's analysis touches a
    * day's files. Within each date partition, rows are sorted by
    * (mmsi, ts): parquet row-group min/max stats on mmsi then cover
    * disjoint id ranges, so a vessel-probe query (`WHERE mmsi = x`)
    * skips every row group but the one holding that vessel — without
    * the sort, each vessel's rows smear across all row groups and the
    * stats prune nothing.
    */
  def run(spark: SparkSession, datalogPath: String, goldOut: String): Long = {
    // peek pushdown: types 1/2/3 + 5 only (the gold table's inputs)
    val decoded = decode(spark.read.text(datalogPath), Seq("1", "2", "3", "5"))
    val g = gold(decoded)
      .withColumn("event_date", org.apache.spark.sql.functions.to_date(col("ts")))
    g.sortWithinPartitions(col("event_date"), col("mmsi"), col("ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(goldOut)
    zoneCount(spark.read.parquet(goldOut)).head().getLong(0)
  }
}
