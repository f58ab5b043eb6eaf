package graft.queries

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.report.DailyLogReport

/** The daily reconciliation report (SURVEY §3.4 — the reference's
  * flagship analytic query) over the [[Fixtures]] log stand-ins, as one
  * end-to-end entry plus its component views, all DuckDB-checked.
  */
object ReportQueries {

  private val now = Timestamp.valueOf("2024-02-01 00:00:00")
  private val reportDate = Date.valueOf("2024-01-31")
  private val nowSql = "TIMESTAMP '2024-02-01 00:00:00'"

  val defs: Seq[(String, Q)] = Seq(

    // vw_process_start_end_time (sql:86-124): run windows via one
    // conditional-agg pass instead of the reference's UNION pivot.
    "q_report_windows" -> Q(
      (s, dir) => DailyLogReport.runWindows(Fixtures.logs(s, dir), now)
        .orderBy(col("HeaderID")),
      Some(s"""WITH logs AS (${Fixtures.logsCte})
              |SELECT HeaderID,
              |  max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) AS Start_LogDateTime,
              |  coalesce(max(CASE WHEN LogEntryType = 'END' THEN LogDateTime END), $nowSql)
              |    AS End_LogDateTime,
              |  CAST(floor(date_diff('second',
              |    max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END),
              |    coalesce(max(CASE WHEN LogEntryType = 'END' THEN LogDateTime END), $nowSql))
              |    / 60.0) AS BIGINT) AS Job_Duration
              |FROM logs GROUP BY HeaderID
              |HAVING max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) IS NOT NULL
              |ORDER BY HeaderID""".stripMargin)),

    // vw_job_row_count (sql:205-214) through the interval join.
    "q_report_rowcounts" -> Q(
      (s, dir) => {
        val logs = Fixtures.logs(s, dir)
        val steps = DailyLogReport.stepsInWindow(logs, DailyLogReport.runWindows(logs, now))
        DailyLogReport.loggedRowCounts(steps).orderBy(col("HeaderID"))
      },
      Some(s"""WITH logs AS (${Fixtures.logsCte}),
              |win AS (
              |  SELECT HeaderID,
              |    max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) AS Start_LogDateTime,
              |    coalesce(max(CASE WHEN LogEntryType = 'END' THEN LogDateTime END), $nowSql)
              |      AS End_LogDateTime
              |  FROM logs GROUP BY HeaderID
              |  HAVING max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) IS NOT NULL)
              |SELECT l.HeaderID,
              |  CAST(sum(CAST(coalesce(l.LogEntryDescription, '0') AS INT)) AS BIGINT) AS LogRowCount
              |FROM logs l JOIN win w ON l.HeaderID = w.HeaderID
              |  AND l.LogDateTime BETWEEN w.Start_LogDateTime AND w.End_LogDateTime
              |WHERE l.LogEntryType = 'ROW_COUNT'
              |GROUP BY l.HeaderID ORDER BY l.HeaderID""".stripMargin)),

    // The full report: windows → interval join → durations → counts →
    // PASS/FAIL verdict (sql:219-232).
    "q_report_daily" -> Q(
      (s, dir) => DailyLogReport.build(
        Fixtures.logs(s, dir), Fixtures.sourceCounts(s, dir), now, reportDate),
      Some(s"""WITH logs AS (${Fixtures.logsCte}),
              |src AS (
              |  SELECT user_id AS HeaderID,
              |    CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS Parquet_Row_Count,
              |    CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS Delta_Count,
              |    600 AS WarningDuration
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
              |win AS (
              |  SELECT HeaderID,
              |    max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) AS Start_LogDateTime,
              |    coalesce(max(CASE WHEN LogEntryType = 'END' THEN LogDateTime END), $nowSql)
              |      AS End_LogDateTime
              |  FROM logs GROUP BY HeaderID
              |  HAVING max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) IS NOT NULL),
              |steps AS (
              |  SELECT l.* FROM logs l JOIN win w ON l.HeaderID = w.HeaderID
              |    AND l.LogDateTime BETWEEN w.Start_LogDateTime AND w.End_LogDateTime),
              |dur AS (
              |  SELECT HeaderID,
              |    max(CASE WHEN LogEntryType = 'START' THEN LogDateTime END) AS Job_Start_Time,
              |    coalesce(max(CASE WHEN LogEntryType = 'AUTO_LOADER' THEN LogDateTime END), $nowSql)
              |      AS Data_Loading_Started_Time,
              |    coalesce(max(CASE WHEN LogEntryType = 'END' THEN LogDateTime END), $nowSql)
              |      AS Process_End
              |  FROM steps GROUP BY HeaderID),
              |dur2 AS (
              |  SELECT *,
              |    CAST(floor(date_diff('second', Job_Start_Time, Data_Loading_Started_Time) / 60.0) AS BIGINT)
              |      AS File_Waiting_Duration_Min,
              |    CAST(floor(date_diff('second', Job_Start_Time, Process_End) / 60.0) AS BIGINT)
              |      AS Total_Job_Duration_Min
              |  FROM dur),
              |rc AS (
              |  SELECT HeaderID,
              |    CAST(sum(CAST(coalesce(LogEntryDescription, '0') AS INT)) AS BIGINT) AS LogRowCount
              |  FROM steps WHERE LogEntryType = 'ROW_COUNT' GROUP BY HeaderID)
              |SELECT s.HeaderID, s.Parquet_Row_Count, s.Delta_Count, s.WarningDuration,
              |  d.Job_Start_Time, d.Data_Loading_Started_Time, d.Process_End,
              |  d.File_Waiting_Duration_Min, d.Total_Job_Duration_Min,
              |  d.Total_Job_Duration_Min - d.File_Waiting_Duration_Min AS File_Loading_Duration_Min,
              |  d.Job_Start_Time + s.WarningDuration * INTERVAL 1 SECOND AS Job_thresholds_End_Time,
              |  CASE WHEN d.Job_Start_Time + s.WarningDuration * INTERVAL 1 SECOND < d.Process_End
              |       THEN 'Job Timeout' ELSE 'NO Timeout' END AS Job_Timeout_Status,
              |  rc.LogRowCount,
              |  CASE WHEN coalesce(s.Parquet_Row_Count, 0) - coalesce(s.Delta_Count, 0) = 0
              |        AND coalesce(s.Parquet_Row_Count, 0) - coalesce(rc.LogRowCount, 0) = 0
              |       THEN 'PASS (Row count match)'
              |       WHEN coalesce(s.Parquet_Row_Count, 0) = 0 AND coalesce(s.Delta_Count, 0) = 0
              |       THEN 'In Progress'
              |       ELSE 'FAIL (Row count match)' END AS RowCountMatchFlag,
              |  DATE '2024-01-31' AS LogDate
              |FROM src s
              |LEFT JOIN dur2 d ON s.HeaderID = d.HeaderID
              |LEFT JOIN rc ON s.HeaderID = rc.HeaderID
              |ORDER BY s.HeaderID""".stripMargin))
  )
}
