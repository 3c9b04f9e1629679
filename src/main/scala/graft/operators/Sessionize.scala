package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: assign a per-key session index that
  * increments whenever the gap to the previous event exceeds `gap`.
  *
  * Plan shape (the part that matters at 100 TB): ONE shuffle on the key,
  * then two window passes over the same (key, ts) sort — Catalyst reuses
  * the sort/partitioning between `lag` and the running sum, so this is
  * shuffle-once + sort-once per key regardless of data size. Session keys
  * are bounded per user, so no skew hazard beyond a single hot key (cap
  * with a salt + re-merge if one key exceeds a partition).
  *
  * Streaming equivalent: `session_window(ts, gap)` aggregation — this is
  * the batch replay with identical semantics (gap measured between
  * consecutive events, strict `>`).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, ordered by ts then tiebreak). */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
                 tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val prev = lag(ts, 1).over(w)
    // microsecond-exact gap: cast(ts as long) floors to whole seconds,
    // under which a 600.9s gap reads as 600 and fails a >600 split —
    // silently different sessions than session_window on sub-second data
    val isNew = when(
      prev.isNull ||
        (unix_micros(ts) - unix_micros(prev)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapses events to one row per (key, session): bounds + count. */
  def sessions(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
               tiebreak: Column): DataFrame =
    sessionize(df, key, ts, gapSeconds, tiebreak)
      .groupBy(key.as("skey"), col("session_seq"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
}
