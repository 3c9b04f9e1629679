package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming aggregations (SURVEY §2.4): watermarked tumbling
  * windows and session windows. The reference keeps state forever and
  * stamps processing time (ais_egressServerCH.py:132-134); these add the
  * event-time/watermark discipline a 100 TB stream needs — state is
  * dropped once the watermark passes, so long-running state size is
  * bounded by (watermark delay x event rate), not by stream lifetime.
  *
  * Both shapes run identically in batch (withWatermark is a no-op there),
  * which is how the session_window variant is oracle-checked (q34).
  */
object StreamOps {

  /** Tumbling-window counts per key; in append mode a window emits once
    * the watermark passes its end, and events older than the watermark
    * are dropped (late-data policy the reference lacks).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n_events"))

  /** Session windows (built-in state merge): a session extends while the
    * next event arrives strictly before last_ts + gap; window end is
    * last_ts + gap. The streaming twin of the batch gaps-and-islands
    * operator (graft.operators.Sessionize) — split rule differs by one
    * ulp of the gap (>= here, > there), both oracle-checked.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
}
