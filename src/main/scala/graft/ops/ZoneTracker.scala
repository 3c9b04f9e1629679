package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful TSS zone entry/exit tracking (SURVEY R8): the reference keeps a
  * set of MMSIs currently inside each zone and a cumulative leave counter,
  * emitting a summary per position event (ais_webSocketServerDb.py:169-260).
  *
  * Streaming form: per-vessel keyed state (inside_N, inside_S) via
  * flatMapGroupsWithState emitting TRANSITION events (delta +1/-1 per
  * zone); the global summary is a downstream running aggregation in update
  * mode. Per-key state is two booleans — at 100k vessels this is trivially
  * bounded, and the transition stream is far smaller than the position
  * stream (most updates don't cross a boundary).
  *
  * Batch replica (oracle-able in SQL): membership flag per event, lag()
  * over (mmsi ORDER BY ts) — a transition is flag != lag(flag).
  */
object ZoneTracker {

  final case class VesselPos(mmsi: Long, ts: java.sql.Timestamp, lon: Double, lat: Double)
  final case class ZoneTransition(
      mmsi: Long, ts: java.sql.Timestamp, zone: String, entered: Boolean)
  final case class InsideState(north: Boolean, south: Boolean)

  /** Streaming transitions for both TSS zones. */
  def transitions(positions: Dataset[VesselPos]): Dataset[ZoneTransition] = {
    val spark = positions.sparkSession
    import spark.implicits._
    positions
      .groupByKey(_.mmsi)
      .flatMapGroupsWithState[InsideState, ZoneTransition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (mmsi: Long, events, state: GroupState[InsideState]) =>
          var st = state.getOption.getOrElse(InsideState(north = false, south = false))
          val out = Seq.newBuilder[ZoneTransition]
          // event-time order within the micro-batch
          events.toSeq.sortBy(_.ts.getTime).foreach { p =>
            val inN = GeoMath.rayCast(p.lon, p.lat, TssZones.Northbound)
            val inS = GeoMath.rayCast(p.lon, p.lat, TssZones.Southbound)
            if (inN != st.north) out += ZoneTransition(mmsi, p.ts, "N", inN)
            if (inS != st.south) out += ZoneTransition(mmsi, p.ts, "S", inS)
            st = InsideState(inN, inS)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch form over a (user_id, event_id, ts, lon, lat) frame: per-key
    * TSS-Northbound entry/exit counts + end-of-batch membership —
    * replaying the reference's per-event counters over event-time order.
    * One window + one aggregation, both keyed by user_id: a single
    * shuffle, fully distributed.
    */
  def perUserSummary(points: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    points
      .withColumn("in_n", Geo.inTssNorthbound(col("lon"), col("lat")))
      .withColumn("prev_n", lag(col("in_n"), 1).over(w))
      .withColumn("final_n", last(col("in_n")).over(wAll))
      .groupBy(col("user_id"))
      .agg(
        count(when(col("in_n") && (col("prev_n").isNull || !col("prev_n")), 1))
          .as("n_enters"),
        count(when(!col("in_n") && col("prev_n"), 1)).as("n_exits"),
        max(col("final_n")).as("inside_at_end"))
  }
}
