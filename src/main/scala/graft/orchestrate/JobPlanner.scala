package graft.orchestrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Job-spec synthesis — the reference's workflow-creation path
  * (modules/create_workflow_jobs.py:85-175, 179-366) as pure planning:
  * the J1 config join (header ⋈ job_config ⋈ control, all tiny →
  * broadcast) plus derived launch parameters, returning a relation of
  * job specs instead of calling a Jobs API. */
object JobPlanner {

  /** The J1 join (create_workflow_jobs.py:108-116): one spec row per
    * current feed, emails split to an array, cron described. */
  def jobSpecs(header: DataFrame, jobs: DataFrame, control: DataFrame): DataFrame =
    header.filter(col("IsCurrent") === 1)
      .join(broadcast(jobs), Seq("HeaderID"))
      .join(broadcast(control.select(col("HeaderID"), col("JobID"))), Seq("HeaderID"))
      .select(
        col("HeaderID"), col("JobID"),
        concat(trim(col("TargetTableSchema")), lit("."),
          trim(col("TargetTableName"))).as("TableName"),
        split(col("Emails"), ",").as("Emails"),
        col("CronSyntax"),
        col("WarningDuration"), col("TimeOut"),
        col("Retries"), col("ClusterMaxWorkers"),
        col("ContinuousRunFlag"))
      .orderBy(col("HeaderID"))

  /** Notebook launch parameters for one feed
    * (create_workflow_jobs.py:122-175): path synthesis under a root. */
  def launchParams(specRow: DataFrame, tablesRoot: String): DataFrame =
    specRow.select(col("HeaderID"), col("TableName"),
      concat(lit(s"$tablesRoot/al_checkpoint/"), col("TableName"), lit("/"))
        .as("checkpoint_path"),
      concat(lit(s"$tablesRoot/al_corrupt/"), col("TableName"), lit("/"))
        .as("corrupt_location"),
      concat(lit(s"$tablesRoot/al_error_file/"), col("TableName"), lit("/"))
        .as("error_file_location"))
}
