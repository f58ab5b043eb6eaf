package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed model of the reference's relational metadata catalog.
  *
  * One case class per catalog table, mirroring the StructTypes the
  * reference declares (schema/schemas/2_header_configuration.py:72-91,
  * 3_column_configuration.py:72-83, 4_control_table.py:67-75,
  * 5_log_table.py:67-78, 6_status_table.py:67-70,
  * 7_job_config_table.py:72-85). Pure data — no Spark session usage —
  * so the model layer is unit-testable without a cluster.
  */
object Catalog {

  /** One row per ingested feed (header_config). */
  final case class HeaderConfig(
      HeaderID: Long,
      SourceContainer: String,
      SourceFilePath: String,
      SourceFileFormat: String,
      SourceFileHeader: Byte,
      SourceFileDelimiter: String,
      TargetTableSchema: String,
      TargetTableName: String,
      IsPII: Byte,
      PIISchema: String,
      PIITableName: String,
      OverWriteFlag: Byte,
      BatchFileCount: Int,
      ContinuousRunFlag: Byte,
      ConfigFile: String,
      IsCurrent: Byte,
      CreatedDateTime: Timestamp,
      LastUpdatedDateTime: Timestamp)

  /** One row per (feed, column) — drives declared schema, ordering,
    * Z-order flags and PII masking (column_config). */
  final case class ColumnConfig(
      HeaderID: Int,
      SourceColumnName: String,
      TargetColumnName: String,
      TargetDataType: String,
      ColumnOrder: Int,
      ZOrder: Byte,
      IsPII: Byte,
      IsCurrent: Byte,
      CreatedDateTime: Timestamp,
      LastUpdatedDateTime: Timestamp)

  /** Per-feed run state machine (process_control). */
  final case class ControlRow(
      HeaderID: Long,
      StatusID: Int,
      ErrorID: Int,
      PreviousBatchID: Option[Int],
      LatestBatchID: Int,
      JobID: Option[Long],
      LastUpdateTime: Timestamp)

  /** Append-only run log (logs). */
  final case class LogRow(
      LogID: Long,
      HeaderID: Long,
      SourceFilePath: String,
      BatchID: Int,
      JobID: Option[String],
      LogEntryType: String,
      LogEntryDescription: String,
      ErrorDescription: Option[String],
      StatusID: Int,
      LogDateTime: Timestamp)

  /** Status dimension (status). */
  final case class StatusRow(StatusID: Long, StatusDescription: String)

  /** Job/orchestration config per feed (job_config). */
  final case class JobConfig(
      HeaderID: Int,
      Alert: Int,
      Emails: String,
      WarningDuration: Int,
      TimeOut: Int,
      Retries: Byte,
      ClusterMaxWorkers: Byte,
      SparkConf: String,
      CronSyntax: String,
      CronSyntaxDescription: String,
      CreatedDateTime: Timestamp,
      LastUpdatedDateTime: Timestamp)

  /** Daily reconciliation report row (daily_log_report,
    * schema/schemas/8_autoloader_log_report.py:67-83). */
  final case class DailyReportRow(
      HeaderID: Long,
      FeedName: String,
      SourceRowCount: Option[Long],
      TargetRowCount: Option[Long],
      LoggedRowCount: Option[Long],
      StartTime: Option[Timestamp],
      EndTime: Option[Timestamp],
      DurationMinutes: Option[Long],
      Verdict: String,
      ReportDate: java.sql.Date)

  /** The 4 constant status rows the reference seeds
    * (modules/insert_config.py:125-144). */
  val statusSeed: Seq[StatusRow] = Seq(
    StatusRow(0L, "Not Started"),
    StatusRow(1L, "Completed"),
    StatusRow(2L, "Cancelled"),
    StatusRow(3L, "Failed"))

  import scala.reflect.runtime.universe.TypeTag
  private def schemaOf[T <: Product: TypeTag]: StructType =
    Encoders.product[T].schema

  lazy val headerSchema: StructType = schemaOf[HeaderConfig]
  lazy val columnSchema: StructType = schemaOf[ColumnConfig]
  lazy val controlSchema: StructType = schemaOf[ControlRow]
  lazy val logSchema: StructType = schemaOf[LogRow]
  lazy val statusSchema: StructType = schemaOf[StatusRow]
  lazy val jobSchema: StructType = schemaOf[JobConfig]
  lazy val reportSchema: StructType = schemaOf[DailyReportRow]
}
