package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic catalog-table stand-ins synthesized from the TESTDATA
  * tables, so catalog/orchestration operators are DuckDB-checkable: each
  * Spark builder has a character-for-character-equivalent DuckDB CTE.
  *
  * `nation` (25 rows) plays the feed catalog: HeaderID = n_nationkey.
  */
object Fixtures {

  /** process_control stand-in: HeaderID, StatusID, JobID, LastUpdateTime. */
  def control(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation").select(
      col("n_nationkey").as("HeaderID"),
      (col("n_nationkey") % 4).as("StatusID"),
      (col("n_nationkey") + lit(1000)).as("JobID"),
      expr("timestampadd(DAY, n_nationkey % 3, TIMESTAMP '2024-01-01 06:30:00')")
        .as("LastUpdateTime"))

  val controlCte: String =
    """SELECT n_nationkey AS HeaderID, n_nationkey % 4 AS StatusID,
      |  n_nationkey + 1000 AS JobID,
      |  TIMESTAMP '2024-01-01 06:30:00' + (n_nationkey % 3) * INTERVAL 1 DAY AS LastUpdateTime
      |FROM nation""".stripMargin

  /** header_config stand-in: HeaderID, TableName, RunFrequency, day
    * flags, SLA "HH:mm". */
  def header(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "nation").select(
      col("n_nationkey").as("HeaderID"),
      concat(lit("analytics."), lower(col("n_name"))).as("TableName"),
      (lit(1) + col("n_nationkey") % 2).as("RunFrequency"),
      format_string("%02d:%02d",
        (lit(6) + col("n_nationkey") % 12), (col("n_nationkey") * 7) % 60).as("SLA"))
    Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun").zipWithIndex
      .foldLeft(base) { case (df, (d, i)) =>
        df.withColumn(d, when(col("HeaderID") % 7 === i, 1).otherwise(0))
      }
  }

  val headerCte: String =
    """SELECT n_nationkey AS HeaderID,
      |  concat('analytics.', lower(n_name)) AS TableName,
      |  1 + n_nationkey % 2 AS RunFrequency,
      |  printf('%02d:%02d', 6 + n_nationkey % 12, (n_nationkey * 7) % 60) AS SLA,
      |  CASE WHEN n_nationkey % 7 = 0 THEN 1 ELSE 0 END AS Mon,
      |  CASE WHEN n_nationkey % 7 = 1 THEN 1 ELSE 0 END AS Tue,
      |  CASE WHEN n_nationkey % 7 = 2 THEN 1 ELSE 0 END AS Wed,
      |  CASE WHEN n_nationkey % 7 = 3 THEN 1 ELSE 0 END AS Thu,
      |  CASE WHEN n_nationkey % 7 = 4 THEN 1 ELSE 0 END AS Fri,
      |  CASE WHEN n_nationkey % 7 = 5 THEN 1 ELSE 0 END AS Sat,
      |  CASE WHEN n_nationkey % 7 = 6 THEN 1 ELSE 0 END AS Sun
      |FROM nation""".stripMargin

  /** Full header_config stand-in for job planning / report config:
    * source paths (some "current"-style), target schema.table parts,
    * IsCurrent and run-mode flags. */
  def headerFull(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation").select(
      col("n_nationkey").as("HeaderID"),
      when(col("n_nationkey") % 4 === 0,
        concat(lit("feeds/current/"), lower(col("n_name"))))
        .otherwise(concat(lit("feeds/"), lower(col("n_name")), lit("/")))
        .as("SourceFilePath"),
      lit("analytics").as("TargetTableSchema"),
      lower(col("n_name")).as("TargetTableName"),
      when(col("n_nationkey") % 7 === 0, 0).otherwise(1).as("IsCurrent"),
      (col("n_nationkey") % 2).as("ContinuousRunFlag"))

  val headerFullCte: String =
    """SELECT n_nationkey AS HeaderID,
      |  CASE WHEN n_nationkey % 4 = 0 THEN concat('feeds/current/', lower(n_name))
      |       ELSE concat('feeds/', lower(n_name), '/') END AS SourceFilePath,
      |  'analytics' AS TargetTableSchema,
      |  lower(n_name) AS TargetTableName,
      |  CASE WHEN n_nationkey % 7 = 0 THEN 0 ELSE 1 END AS IsCurrent,
      |  n_nationkey % 2 AS ContinuousRunFlag
      |FROM nation""".stripMargin

  /** job_config stand-in: alerting/cron/limits per feed. */
  def jobs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation").select(
      col("n_nationkey").as("HeaderID"),
      concat(lit("a-"), lower(col("n_name")), lit("@x.com,b-"),
        lower(col("n_name")), lit("@x.com")).as("Emails"),
      lit("0 0 3 * * ?").as("CronSyntax"),
      (lit(600) + col("n_nationkey") * 10).as("WarningDuration"),
      (lit(1200) + col("n_nationkey") * 10).as("TimeOut"),
      lit(2).as("Retries"),
      (lit(1) + col("n_nationkey") % 4).as("ClusterMaxWorkers"))

  val jobsCte: String =
    """SELECT n_nationkey AS HeaderID,
      |  concat('a-', lower(n_name), '@x.com,b-', lower(n_name), '@x.com') AS Emails,
      |  '0 0 3 * * ?' AS CronSyntax,
      |  600 + n_nationkey * 10 AS WarningDuration,
      |  1200 + n_nationkey * 10 AS TimeOut,
      |  2 AS Retries,
      |  1 + n_nationkey % 4 AS ClusterMaxWorkers
      |FROM nation""".stripMargin

  /** logs stand-in derived from `events`: signup→START, view→AUTO_LOADER,
    * purchase→ROW_COUNT, error→END; value carried as the description. */
  def logs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("user_id").as("HeaderID"),
      col("ts").as("LogDateTime"),
      when(col("event_type") === "signup", "START")
        .when(col("event_type") === "view", "AUTO_LOADER")
        .when(col("event_type") === "purchase", "ROW_COUNT")
        .when(col("event_type") === "error", "END")
        .otherwise("INFO").as("LogEntryType"),
      // floor-then-cast: Spark's double→int cast truncates while DuckDB's
      // rounds, so the truncation must be explicit on both sides.
      floor(col("value")).cast("int").cast("string").as("LogEntryDescription"))

  val logsCte: String =
    """SELECT user_id AS HeaderID, ts AS LogDateTime,
      |  CASE event_type WHEN 'signup' THEN 'START' WHEN 'view' THEN 'AUTO_LOADER'
      |    WHEN 'purchase' THEN 'ROW_COUNT' WHEN 'error' THEN 'END'
      |    ELSE 'INFO' END AS LogEntryType,
      |  CAST(CAST(floor(value) AS INT) AS VARCHAR) AS LogEntryDescription
      |FROM events""".stripMargin

  /** Source/target row-count stand-in (vw_parquet_file_row_count):
    * Parquet_Row_Count = Delta_Count = total purchase value per user, so
    * the verdict PASSes exactly when every ROW_COUNT line landed inside
    * the run window. WarningDuration fixed at 600 s (BASELINE.md). */
  def sourceCounts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("HeaderID"))
      .agg(sum(floor(col("value")).cast("int")).as("Parquet_Row_Count"))
      .withColumn("Delta_Count", col("Parquet_Row_Count"))
      .withColumn("WarningDuration", lit(600))

  val sourceCountsCte: String =
    """SELECT user_id AS HeaderID,
      |  CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS Parquet_Row_Count,
      |  CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS Delta_Count,
      |  600 AS WarningDuration
      |FROM events WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin
}
