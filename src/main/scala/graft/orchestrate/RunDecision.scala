package graft.orchestrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Orchestration decisions as pure functions of (control, header, clock) —
  * the reference's run/restart/SLA driver (notebooks/Run jobs.py:81-202)
  * minus the Databricks Jobs API calls, which the rebuild models as a
  * returned action column instead of side effects.
  *
  * Clock inputs are injected (`today`, `nowTime` "HH:mm", `shortDay`
  * "Mon".."Sun") so tests and the DuckDB oracle are deterministic.
  * Both inputs are feed-catalog tables (one row per feed) — tiny — so
  * the header side of every join is broadcast.
  */
object RunDecision {

  /** The NeedToRun CTE (Run jobs.py:81-132): control ⟕ header, ran-today
    * ∧ status∈{1,2} → 0, in-flight (status=1) → 0, else 1; emit only the
    * rows that need a (re)run. */
  def needToRun(control: DataFrame, header: DataFrame, today: java.sql.Date): DataFrame =
    control.join(broadcast(header), Seq("HeaderID"), "left")
      .withColumn("NeedToRun",
        when(col("LastUpdateTime").cast("date") === lit(today) &&
             col("StatusID").isin(1, 2), lit(0))
          .otherwise(when(col("StatusID") === 1, lit(0)).otherwise(lit(1))))
      .filter(col("NeedToRun") === 1)
      .select(col("HeaderID"), col("JobID"), col("TableName"), col("RunFrequency"),
        col("Mon"), col("Tue"), col("Wed"), col("Thu"), col("Fri"),
        col("Sat"), col("Sun"), col("SLA"))

  /** The per-job run/cancel decision (Run jobs.py:150-202): inside SLA →
    * run when daily (RunFrequency=1) or when weekly and today's flag is
    * set; past SLA → cancel. "HH:mm" strings compare lexically, exactly
    * as the reference's time-of-day compare. */
  def decide(toRun: DataFrame, nowTime: String, shortDay: String): DataFrame = {
    val dayFlag = col(shortDay) // Mon..Sun column picked by the injected day
    toRun.withColumn("Action",
      when(lit(nowTime) <= col("SLA"),
        when(col("RunFrequency") === 1, lit("run"))
          .when(col("RunFrequency") === 2 && dayFlag === 1, lit("run"))
          .otherwise(lit("skip")))
        .otherwise(lit("cancel")))
  }

  /** The pending-job SLA sweep (Run jobs.py:180-202): in-flight rows
    * (StatusID=1) whose SLA has passed. */
  def slaCancel(control: DataFrame, header: DataFrame, nowTime: String): DataFrame =
    control.filter(col("StatusID") === 1)
      .join(broadcast(header), Seq("HeaderID"), "left")
      .filter(lit(nowTime) > col("SLA"))
      .select(col("HeaderID"), col("JobID"), col("SLA"), col("TableName"))

  /** Run the SLA sweep and notify per cancelled job — the reference
    * posts a chat card for each cancellation (Run jobs.py:180-202 +
    * send_google_chat.py:79-87). The cancel set is one row per
    * past-deadline feed (tiny by construction), so the collect is a
    * driver-side scalar fetch, not a data collect. Returns the
    * cancelled HeaderIDs. */
  def sweepAndNotify(control: DataFrame, header: DataFrame, nowTime: String,
                     notifier: graft.notify.Notifier): Seq[Long] =
    slaCancel(control, header, nowTime).collect().toSeq.map { r =>
      val headerId = r.getAs[Number]("HeaderID").longValue
      notifier.notify("SLA_CANCEL", Option(r.getString(r.fieldIndex("TableName")))
        .getOrElse(s"header $headerId"),
        s"job ${r.get(r.fieldIndex("JobID"))} past SLA ${r.get(r.fieldIndex("SLA"))} at $nowTime — cancelled")
      headerId
    }
}
