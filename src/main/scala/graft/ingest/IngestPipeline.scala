package graft.ingest

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{MetaStore, ParquetTable}
import graft.model.FeedConfig.{ColumnSpec, Feed}

/** The per-micro-batch state machine
  * (modules/auto_loader_steps.py:411-479 `microbatch_process` +
  * :323-409 `load_data`): system columns → schema-drift detect/evolve →
  * corrupt gate → select/rename → PII fork → sink → log + control
  * bookkeeping.
  *
  * The clock is injected so tests and oracle queries are deterministic
  * (the reference stamps current_date()/current_timestamp() directly,
  * auto_loader_steps.py:423-425).
  *
  * Scale notes: every step is a narrow transform over the batch — no
  * shuffle at all on the happy path (select/rename/withColumn/filter),
  * and the only action besides the sink write is the corrupt-count,
  * which the reference also pays. Catalog lookups are driver-side reads
  * of tiny tables.
  */
final class IngestPipeline(
    val spark: SparkSession,
    val feed: Feed,
    val meta: MetaStore,
    val targetPath: String,
    val piiPath: Option[String] = None,
    val corruptPath: Option[String] = None,
    val errorDir: Option[String] = None,
    val clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  @volatile var columns: Seq[ColumnSpec] = feed.Columns
  @volatile var driftEvents: Seq[String] = Nil

  def target: ParquetTable =
    ParquetTable(spark, feed.TargetTableName, targetPath, SchemaTools.targetSchema(columns))

  def piiTarget: Option[ParquetTable] = piiPath.map(p =>
    ParquetTable(spark, feed.PIITableName, p, SchemaTools.targetSchema(columns)))

  /** CREATE OR REPLACE TABLE from column config
    * (modules/delta_table_create_tables.py:91-114). */
  def createTargets(): Unit = {
    target.createIfNotExists()
    piiTarget.foreach(_.createIfNotExists())
  }

  /** Idempotent daily re-run: delete today's rows before re-ingesting
    * (delete_table_records_step, Data Ingestion Helper.py:139-142), so
    * replaying the same day's files never duplicates. */
  def deleteToday(): Unit = {
    val today = new Date(clock().getTime)
    if (target.exists) target.deleteWhere(col("InsertDate") === lit(today))
    piiTarget.filter(_.exists)
      .foreach(_.deleteWhere(col("InsertDate") === lit(today)))
  }

  private def log(batchId: Long, entryType: String, desc: String,
                  statusId: Int, error: Option[String] = None): Unit =
    meta.logAndControl(feed.HeaderID, feed.SourceFilePath, batchId.toInt,
      entryType, desc, statusId, error, now = clock())

  /** Drift evolution shared by the batch-side preflight (the reference
    * re-syncs config→table before each ingest, Data Ingestion
    * Helper.py:193-283) and the per-batch check: config gains the extra
    * columns as `string` after the current max ColumnOrder, the
    * column-config catalog table gains matching rows
    * (auto_loader_steps.py:223-247). */
  def evolveIfDrifted(extras: Seq[org.apache.spark.sql.types.StructField],
                      batchId: Long, now: Timestamp): Unit =
    if (extras.nonEmpty) {
      columns = SchemaTools.evolve(columns, extras)
      driftEvents = driftEvents ++ extras.map(_.name)
      import spark.implicits._
      val maxOrder = columns.map(_.ColumnOrder).max
      meta.columns.append(
        extras.zipWithIndex.map { case (f, i) =>
          graft.model.Catalog.ColumnConfig(feed.HeaderID, f.name, f.name,
            "string", maxOrder - extras.size + i + 1, 0, 0, 1, now, now)
        }.toDS().toDF())
      log(batchId, "AUTO_LOADER", "New column(s) detected and added.", 1)
    }

  /** One micro-batch, start to finish. Returns rows loaded. */
  def processBatch(batch: DataFrame, batchId: Long): Long = {
    val now = clock()
    // System columns (auto_loader_steps.py:423-425).
    val stamped = batch
      .withColumn("BatchId", lit(batchId.toInt + 1))
      .withColumn("InsertDate", lit(new Date(now.getTime)))
      .withColumn("ModifiedDateTime", lit(now))

    // Schema drift: batch columns not in config → config gains string
    // columns at the end; target evolves on next write via align()
    // (auto_loader_steps.py:189-275).
    evolveIfDrifted(SchemaTools.extraColumns(stamped, columns), batchId, now)

    // Corrupt gate (auto_loader_steps.py:277-315): any row with a
    // non-null rescue column fails the batch into quarantine. The
    // reference counts distinct() corrupt rows — a full batch shuffle;
    // filter-then-count is shuffle-free, counts duplicates correctly,
    // and the gate only needs count > 0.
    if (stamped.columns.contains(IngestPipeline.RescueColumn)) {
      val corrupt = stamped.filter(col(IngestPipeline.RescueColumn).isNotNull)
      val corruptRows = corrupt.count()
      if (corruptRows > 0) {
        corruptPath.foreach(p =>
          stamped.write.mode("overwrite").parquet(p))
        if (stamped.columns.contains("source_file_path"))
          for (dir <- errorDir;
               row <- corrupt.select("source_file_path").distinct().collect())
            FileOps.moveToError(spark, row.getString(0), dir)
        log(batchId, "AUTO_LOADER", s"Bad records: $corruptRows", 3,
          error = Some(s"$corruptRows corrupt rows quarantined"))
        throw new IllegalStateException("Bad records")
      }
    }

    loadData(stamped, batchId)
  }

  /** load_data (auto_loader_steps.py:323-409): ordered select, rename to
    * target names, PII fork, append/overwrite sink, row-count log. */
  private def loadData(stamped: DataFrame, batchId: Long): Long = {
    val ordered = columns.sortBy(_.ColumnOrder)
    val selectCols = ordered.map(c => col(c.SourceColumnName)) ++
      Seq(col("BatchId"), col("InsertDate"), col("ModifiedDateTime"))
    val renames = ordered
      .filter(c => c.SourceColumnName != c.TargetColumnName)
      .map(c => c.SourceColumnName -> c.TargetColumnName).toMap
    val projected = stamped.select(selectCols: _*).withColumnsRenamed(renames)

    val mode = if (feed.OverWriteFlag == 1) "overwrite" else "append"
    val rows = projected.count()

    if (mode == "overwrite") target.overwrite(projected) else target.append(projected)

    // PII shadow table with masked values (auto_loader_steps.py:345-375).
    piiTarget.foreach { pii =>
      val masked = Masking.maskPII(projected, columns)
      if (mode == "overwrite") pii.overwrite(masked) else pii.append(masked)
    }

    log(batchId, "ROW_COUNT", rows.toString, 1)
    log(batchId, "AUTO_LOADER", s"Batch $batchId loaded ($mode)", 1)
    rows
  }
}

object IngestPipeline {
  /** Rebuild stand-in for Databricks `_rescued_data`: the PERMISSIVE
    * corrupt-record capture column (SURVEY §7.4 risk 3). */
  val RescueColumn = "_rescued_data"
}
