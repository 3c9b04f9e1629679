package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify each key's timeline to a fixed grid
  * and forward-fill missing observations (last-observation-carried-
  * forward) — the gap-fill step before any training-data or reporting
  * join against a regular calendar.
  *
  * Plan shape: per-key daily aggregation (one shuffle), per-key grid via
  * `sequence` + `explode` (narrow — the grid explodes from one row per
  * key, size = key's day span), left join grid↔observed on (key, day)
  * (co-partitioned: both sides just shuffled on the same key — AQE
  * coalesces), then ONE window pass for the fill. Nothing here is
  * all-pairs or driver-side; 100 TB scales by key count × grid length.
  */
object Resample {

  /** Daily grid per key spanning that key's [min(day), max(day)], left
    * join observations, forward-fill `valueCol` with
    * last(ignoreNulls). Day is `date_trunc(day, ts)`.
    * Output: key, day, filled value, plus an `observed` flag.
    */
  def dailyForwardFill(df: DataFrame, key: Column, ts: Column,
                       value: Column): DataFrame = {
    val day = to_date(date_trunc("DAY", ts))
    val observed = df
      .groupBy(key.as("fkey"), day.as("day"))
      .agg(value.as("day_value"))
    val grid = observed
      .groupBy(col("fkey"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("fkey"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col("fkey")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq("fkey", "day"), "left")
      .select(
        col("fkey"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("day_value").isNotNull.as("observed"))
  }
}
