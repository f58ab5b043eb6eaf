package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill — turn an irregular event
  * stream into a dense per-group time grid (the shape every
  * monitoring/feature pipeline wants before windowed models see it).
  *
  * The dense axis is generated per group from that group's own
  * [min, max] bucket span (`sequence` + `explode` — generation is
  * distributed, proportional to each group's span, and never a
  * driver-side loop), then left-joined back onto the aggregated
  * buckets. Missing buckets surface as count 0 / value 0.0, plus a
  * last-observation-carried-forward column for consumers that want a
  * step function instead of zeros. Scale shape: the input is touched
  * by exactly ONE full-data shuffle (the bucket aggregation, with
  * map-side partials); everything after — the axis join and the LOCF
  * window — runs on the aggregated grid, whose size is
  * groups × buckets, orders of magnitude below the event count.
  */
object Resample {

  /** Aggregate `df` to one row per (`groupCol`, truncated `tsCol`
    * bucket) and densify each group's time axis at `unit` granularity
    * ("hour", "day", …). Output: bucket row count, zero-filled bucket
    * value sum, and LOCF of the bucket value. */
  def gapFill(df: DataFrame, groupCol: String, tsCol: String,
              valueCol: String, unit: String = "hour"): DataFrame = {
    val agg = df
      .select(col(groupCol), date_trunc(unit, col(tsCol)).as("bucket"),
        col(valueCol))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("bucket_value"))
    val axis = agg
      .groupBy(col(groupCol))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col(groupCol),
        explode(sequence(col("mn"), col("mx"), expr(s"INTERVAL 1 $unit")))
          .as("bucket"))
    val locf = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    axis.join(agg, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("bucket_value"), lit(0.0)).as("bucket_value"),
        coalesce(last(col("bucket_value"), ignoreNulls = true).over(locf),
          lit(0.0)).as("value_locf"))
  }
}
