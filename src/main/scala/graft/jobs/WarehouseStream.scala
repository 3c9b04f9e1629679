package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ais.AisDecoder
import graft.ops.{Reassembly, Routes}

/** The reference's streaming warehouse topology (SURVEY §3.2) collapsed
  * into one Spark lineage: the three TCP processes
  * (ais_ingressServer.py -> ais_nmeaParserSocket.py -> ais_egressServerCH.py)
  * become reassembly -> decode -> four routed sinks off a single decoded
  * stream. The reference's count-20 insert buffering (R11,
  * ais_egressServerCH.py:111) becomes the micro-batch trigger — a
  * documented semantic change: time-bounded batches instead of row-count
  * bounded, with checkpointed at-least-once delivery instead of the
  * reference's at-most-once buffered inserts.
  */
object WarehouseStream {

  /** Raw sentence lines -> decoded union-struct stream (with event ts). */
  def decodedStream(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val frags = Reassembly.parseFragments(lines).as[Reassembly.Fragment]
    val assembled = Reassembly.assembleStream(frags).toDF()
    assembled
      .withColumn("ts", current_timestamp()) // processing-time stamp, as the
                                             // reference does at ingest
                                             // (ais_egressServerCH.py:132-134)
      .withColumn("d", AisDecoder.ais_decode(col("sentences")))
      .filter(col("d").isNotNull)
  }

  /** Start the four warehouse routes as parquet table sinks under
    * `outDir`/(position|static|type21|type6_533). One decoded lineage,
    * four writers — Spark runs them as independent queries sharing the
    * source; `foreachBatch` is the JDBC/ClickHouse hook in production.
    */
  def start(spark: SparkSession, lines: DataFrame, outDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : Seq[StreamingQuery] = {
    val decoded = decodedStream(lines)
    def sink(df: DataFrame, name: String): StreamingQuery =
      df.writeStream
        .outputMode("append")
        .trigger(trigger)
        .option("checkpointLocation", s"$checkpointDir/$name")
        .format("parquet")
        .option("path", s"$outDir/$name")
        .start()
    Seq(
      sink(Routes.positionRoute(decoded), "position"),
      sink(Routes.staticRoute(decoded), "static"),
      sink(Routes.aidNavRoute(decoded), "type21"),
      sink(Routes.telemetryRoute(decoded), "type6_533"))
  }
}
