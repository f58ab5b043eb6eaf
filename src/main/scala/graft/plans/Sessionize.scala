package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gap-islands idiom. The streaming twin
  * ([[graft.streaming.EventStream.sessionize]]) holds per-key state
  * across micro-batches; this is the backfill/replay form a pipeline
  * runs over historical events: two windows over ONE user-partitioned
  * sort (lag to flag gap starts, running sum to number the islands),
  * then a group-agg whose clustering keys start with the window's
  * partition key, so Catalyst reuses the same hash partitioning — one
  * shuffle end to end, no self-join, no state.
  *
  * Gap comparison is in integral microseconds (`unix_micros`), never
  * double seconds: exact, overflow-safe, and recomputable bit-for-bit
  * by any engine.
  */
object Sessionize {

  /** Collapse `events` into per-user sessions: consecutive events whose
    * inter-event gap is ≤ `gapSeconds` share a session. `tieCol` breaks
    * equal-timestamp ordering so the numbering is total and
    * deterministic under any partitioning.
    */
  /** Per-event session labels: every input row with a `session_id`
    * column attached (1-based per user, gap-islands numbering). The
    * labeling [[batch]] aggregates over, exposed for consumers that
    * need the EVENTS of a session (sequence construction), not just
    * its summary. One shuffle on the user key. */
  def labeled(events: DataFrame, userCol: String, tsCol: String,
              tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isStart = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id", sum(col("__start")).over(run).cast("int"))
      .drop("__start")
  }

  def batch(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
            valueCol: String, gapSeconds: Long): DataFrame = {
    labeled(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }
}
