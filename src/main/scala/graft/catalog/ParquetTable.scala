package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A parquet-directory-backed mutable table with the DML surface the
  * reference gets from Delta: UPDATE / DELETE / TRUNCATE / MERGE / append
  * / overwrite (SURVEY §2.9). Mutations are read-transform-rewrite with an
  * atomic-ish directory swap:
  *
  *   write new contents to `<path>.__stage` → delete `<path>` →
  *   rename stage to `<path>`
  *
  * (`modules/log_table_control_table_upsert.py:71-75` UPDATE,
  *  `notebooks/Data Ingestion Helper.py:140` DELETE,
  *  `modules/insert_config.py:172,281,357` TRUNCATE.)
  *
  * The rename is atomic per HDFS/posix semantics; the delete+rename pair
  * is not transactional, which matches this engine's single-writer
  * design (the reference serializes writers per table through the
  * control-table state machine too). Readers always go through
  * [[read]], which re-opens the directory, so they never hold a stale
  * snapshot across a swap.
  */
final class ParquetTable(
    val spark: SparkSession,
    val name: String,
    val path: String,
    val schema: StructType) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** Create as empty if the directory is absent
    * (schema/schemas/2_header_configuration.py:135-146 bootstrap). */
  def createIfNotExists(): this.type = {
    if (!exists) overwrite(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema))
    this
  }

  def read(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Register under `name` so spark.sql text can reference it
    * (CREATE OR REPLACE TEMP VIEW, insert_config.py:125,437). */
  def registerView(): this.type = {
    read().createOrReplaceTempView(name)
    this
  }

  def append(df: DataFrame): Unit = {
    align(df).write.mode("append").parquet(path)
  }

  def overwrite(df: DataFrame): Unit = {
    val stage = new Path(path + ".__stage")
    val dest = new Path(path)
    align(df).write.mode("overwrite").parquet(stage.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(stage, dest))
      throw new java.io.IOException(s"atomic swap failed for $path")
  }

  /** UPDATE t SET <set> WHERE <pred> — read-modify-rewrite. */
  def update(pred: Column, set: Map[String, Column]): Unit = {
    val cur = read()
    overwrite(cur.select(cur.columns.map { c =>
      set.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))
    }.toSeq: _*))
  }

  /** DELETE FROM t WHERE <pred> — anti-filter + rewrite. */
  def deleteWhere(pred: Column): Unit =
    overwrite(read().filter(!coalesce(pred, lit(false))))

  /** TRUNCATE TABLE t. */
  def truncate(): Unit =
    overwrite(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))

  /** MERGE INTO t USING source — full clause family, see [[Merge]]. */
  def upsert(
      source: DataFrame,
      keys: Seq[String],
      whenMatchedUpdate: Map[String, Column],
      whenNotMatchedInsert: Boolean = true,
      insertDefaults: Map[String, Column] = Map.empty,
      whenNotMatchedBySourceSet: Map[String, Column] = Map.empty): Unit =
    overwrite(Merge.merge(read(), source, keys, whenMatchedUpdate,
      whenNotMatchedInsert, insertDefaults, whenNotMatchedBySourceSet))

  /** OPTIMIZE [ZORDER BY cols] equivalent: compact small files and
    * cluster rows so min/max parquet stats prune on the z columns
    * (modules/auto_loader_steps.py:481-498). On a cluster the
    * repartitionByRange gives range-partitioned files whose column stats
    * are disjoint — the parquet-native analogue of z-ordering. */
  def compact(zorderCols: Seq[String] = Nil, targetPartitions: Int = 1): Unit = {
    val cur = read()
    val arranged =
      if (zorderCols.nonEmpty)
        cur.repartitionByRange(math.max(targetPartitions, 1), zorderCols.map(col): _*)
          .sortWithinPartitions(zorderCols.map(col): _*)
      else cur.coalesce(math.max(targetPartitions, 1))
    overwrite(arranged)
  }

  private def align(df: DataFrame): DataFrame = {
    val cols = schema.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name))
    df.select(cols.toSeq: _*)
  }
}

object ParquetTable {
  def apply(spark: SparkSession, name: String, path: String, schema: StructType): ParquetTable =
    new ParquetTable(spark, name, path, schema)
}
