package graft.catalog

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Catalog

/** The metadata catalog: seven parquet-backed tables under one root
  * directory, mirroring the reference's `autoloader` schema
  * (config/schemas_tables.json:1-54; bootstrap scripts
  * schema/schemas/1_schemas.py..8_autoloader_log_report.py).
  *
  * All tables are tiny relative to the data being ingested (one row per
  * feed / per column / per log line), so every join from data-plane
  * queries against them must broadcast — the query layer does so
  * explicitly.
  */
final class MetaStore(val spark: SparkSession, val root: String) {
  import Catalog._

  val header  = ParquetTable(spark, "header_config",  s"$root/header_config",  headerSchema)
  val columns = ParquetTable(spark, "column_config",  s"$root/column_config",  columnSchema)
  val control = ParquetTable(spark, "process_control",s"$root/process_control",controlSchema)
  val logs    = ParquetTable(spark, "logs",           s"$root/logs",           logSchema)
  val status  = ParquetTable(spark, "status",         s"$root/status",         statusSchema)
  val jobs    = ParquetTable(spark, "job_config",     s"$root/job_config",     jobSchema)
  val report  = ParquetTable(spark, "daily_log_report", s"$root/daily_log_report", reportSchema)

  def all: Seq[ParquetTable] = Seq(header, columns, control, logs, status, jobs, report)

  /** CREATE SCHEMA + CREATE TABLE IF NOT EXISTS ×7 + seed the status
    * dimension (insert-only MERGE, insert_config.py:146-161). */
  def bootstrap(): this.type = {
    all.foreach(_.createIfNotExists())
    import spark.implicits._
    val seed = statusSeed.toDS().toDF()
    status.overwrite(Merge.insertWhenNotMatched(status.read(), seed, Seq("StatusID")))
    this
  }

  def registerViews(): this.type = { all.foreach(_.registerView()); this }

  private val logSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One log entry: (entryType, description, statusId, error). */
  type LogEntry = (String, String, Int, Option[String])

  /** Append one log row and update the control-table state machine — the
    * reference's update_insert_log_control
    * (modules/log_table_control_table_upsert.py:9-75). */
  def logAndControl(
      headerId: Long, sourcePath: String, batchId: Int, entryType: String,
      description: String, statusId: Int, error: Option[String] = None,
      jobId: Option[String] = None, now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit =
    logAndControlMany(headerId, sourcePath, batchId,
      Seq((entryType, description, statusId, error)), jobId, now)

  /** Batched variant: N log rows in ONE append, control updated ONCE
    * (to the last entry's status). A micro-batch logs 2+ entries; at a
    * sub-second trigger the per-entry read-rewrite of the control table
    * is pure driver job churn, so callers pass the batch's entries
    * together. LogID is unique within this store instance even when
    * many rows share a timestamp (millis × 10^6 + in-process
    * sequence). */
  def logAndControlMany(
      headerId: Long, sourcePath: String, batchId: Int,
      entries: Seq[LogEntry], jobId: Option[String] = None,
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    import spark.implicits._
    require(entries.nonEmpty, "logAndControlMany needs at least one entry")
    val rows = entries.map { case (entryType, description, statusId, error) =>
      val logId = now.getTime * 1000000L + (logSeq.incrementAndGet() % 1000000L)
      LogRow(logId, headerId, sourcePath, batchId, jobId,
        entryType, description, error, statusId, now)
    }
    logs.append(rows.toDS().toDF())

    val statusId = entries.last._3
    val existing = control.read().filter(col("HeaderID") === headerId).limit(1).count() > 0
    if (existing) {
      control.update(col("HeaderID") === headerId, Map(
        "StatusID" -> lit(statusId),
        "PreviousBatchID" -> col("LatestBatchID"),
        "LatestBatchID" -> lit(batchId),
        "LastUpdateTime" -> lit(now)))
    } else {
      control.append(Seq(ControlRow(headerId, statusId, 0, None, batchId, None, now))
        .toDS().toDF())
    }
  }
}
