package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.model.FeedConfig.ColumnSpec

/** Schema construction, drift detection and column ordering — the
  * reference's hand-built JSON-schema/hints machinery
  * (modules/auto_loader_steps.py:145-187) and set-difference drift check
  * (:205-213; notebooks/Data Ingestion Helper.py:225-231), re-expressed
  * over `StructType` metadata. Nothing here ever scans data: drift is a
  * schema-to-config diff.
  */
object SchemaTools {

  /** Declared read schema from the column config, in ColumnOrder
    * (auto_loader_steps.py:145-164). `DataType.fromDDL` handles
    * decimal(10,2) etc. directly. */
  def declaredSchema(cols: Seq[ColumnSpec]): StructType =
    StructType(cols.sortBy(_.ColumnOrder).map(c =>
      StructField(c.SourceColumnName, DataType.fromDDL(c.TargetDataType), nullable = true)))

  /** The reference's `schemaHints()` DDL string — kept for API parity
    * (auto_loader_steps.py:179-187). */
  def schemaHints(cols: Seq[ColumnSpec]): String =
    cols.sortBy(_.ColumnOrder)
      .map(c => s"${c.SourceColumnName} ${c.TargetDataType}").mkString(", ")

  /** System columns stamped on every target row
    * (delta_table_create_tables.py:107). */
  val systemFields: Seq[StructField] = Seq(
    StructField("BatchId", IntegerType),
    StructField("InsertDate", DateType),
    StructField("ModifiedDateTime", TimestampType))

  /** Full target-table schema: configured columns (target names, in
    * order) + system columns. */
  def targetSchema(cols: Seq[ColumnSpec]): StructType =
    StructType(cols.sortBy(_.ColumnOrder).map(c =>
      StructField(c.TargetColumnName, DataType.fromDDL(c.TargetDataType), nullable = true))
      ++ systemFields)

  /** Drift: columns present in the batch but absent from the config
    * (set difference on names, auto_loader_steps.py:205-213), ignoring
    * transient/system columns. Returned in batch-schema order so the
    * assigned ColumnOrder values are deterministic. */
  def extraColumns(batch: DataFrame, cols: Seq[ColumnSpec]): Seq[StructField] = {
    val known = cols.map(_.SourceColumnName).toSet ++
      Set("BatchId", "InsertDate", "ModifiedDateTime", "_rescued_data", "source_file_path")
    batch.schema.fields.toSeq.filterNot(f => known.contains(f.name))
  }

  /** Evolve a column config with drift columns: appended as `string`
    * after the current max ColumnOrder, exactly like the reference's
    * INSERT + ALTER ADD COLUMNS dance (auto_loader_steps.py:223-247). */
  def evolve(cols: Seq[ColumnSpec], extras: Seq[StructField]): Seq[ColumnSpec] = {
    val maxOrder = if (cols.isEmpty) 0 else cols.map(_.ColumnOrder).max
    cols ++ extras.zipWithIndex.map { case (f, i) =>
      ColumnSpec(f.name, f.name, "string", maxOrder + i + 1)
    }
  }
}
