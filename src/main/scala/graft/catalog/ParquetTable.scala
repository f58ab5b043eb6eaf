package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A parquet-directory-backed mutable table with the DML surface the
  * reference gets from Delta: UPDATE / DELETE / TRUNCATE / MERGE / append
  * / overwrite (SURVEY §2.9). Mutations are read-transform-rewrite with a
  * crash-safe directory swap:
  *
  *   write new contents to `<path>.__stage` → rename `<path>` to
  *   `<path>.__old` → rename stage to `<path>` → delete `.__old`
  *
  * (`modules/log_table_control_table_upsert.py:71-75` UPDATE,
  *  `notebooks/Data Ingestion Helper.py:140` DELETE,
  *  `modules/insert_config.py:172,281,357` TRUNCATE.)
  *
  * Each rename is atomic per HDFS/posix semantics. A crash between the
  * two renames leaves the live directory absent but `.__old` intact;
  * every entry point calls [[recover]] which rolls the swap back by
  * renaming `.__old` into place — so committed data always survives a
  * crash at any point (the old `delete dest → rename` sequence had an
  * unrecoverable window between the delete and the rename). Single
  * writer per table, which matches the reference (it serializes writers
  * per table through the control-table state machine too). Readers
  * always go through [[read]], which re-opens the directory, so they
  * never hold a stale snapshot across a swap.
  *
  * ==Transaction markers==
  * A swap can additionally publish a `(appId → batchId)` marker, stored
  * in a `_graft_txn` sidecar INSIDE the staged directory and therefore
  * made visible by the SAME atomic rename as the data (Delta's
  * txn-version-in-commit pattern). This is what makes the streaming
  * [[graft.streaming.UpsertSink]] exactly-once even for non-idempotent
  * (e.g. additive `tgt + src`) MERGE updates: there is no state where
  * the data landed but the marker did not. Markerless mutations carry
  * the existing markers forward, so a compaction or update between
  * stream batches does not reset the stream's dedup state. The leading
  * underscore keeps the sidecar invisible to parquet readers (same
  * convention as `_SUCCESS`).
  */
final class ParquetTable(
    val spark: SparkSession,
    val name: String,
    val path: String,
    val schema: StructType) {

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dest = new Path(path)
  private def stagePath = new Path(path + ".__stage")
  private def oldPath = new Path(path + ".__old")

  /** Roll back an interrupted swap: live dir absent + `.__old` present
    * means the crash hit between the two renames — restore `.__old`. */
  private def recover(): Unit = {
    val f = fs
    if (!f.exists(dest) && f.exists(oldPath) && !f.rename(oldPath, dest))
      throw new java.io.IOException(s"swap recovery failed for $path")
  }

  def exists: Boolean = { recover(); fs.exists(dest) }

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
    recover()
    align(df).write.mode("append").parquet(path)
  }

  def overwrite(df: DataFrame): Unit = overwrite(df, None)

  /** Overwrite, optionally publishing `txn = (appId, batchId)` in the
    * same atomic rename as the data. */
  def overwrite(df: DataFrame, txn: Option[(String, Long)]): Unit = {
    recover()
    val f = fs
    val carried = readTxns() // before any mutation of dest
    align(df).write.mode("overwrite").parquet(stagePath.toString)
    val txns = txn.fold(carried)(carried + _)
    if (txns.nonEmpty) writeTxns(stagePath, txns)
    if (f.exists(oldPath)) f.delete(oldPath, true) // stale garbage only
    if (f.exists(dest) && !f.rename(dest, oldPath))
      throw new java.io.IOException(s"swap set-aside failed for $path")
    if (!f.rename(stagePath, dest))
      throw new java.io.IOException(s"atomic swap failed for $path")
    f.delete(oldPath, true)
  }

  /** Highest batch id atomically committed with the data for `appId`,
    * if any batch from that writer has committed. */
  def lastTxn(appId: String): Option[Long] = { recover(); readTxns().get(appId) }

  private def readTxns(): Map[String, Long] = {
    val f = fs
    val file = new Path(dest, "_graft_txn")
    if (!f.exists(file)) Map.empty
    else {
      val in = f.open(file)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { line =>
          val i = line.lastIndexOf('\t')
          line.substring(0, i) -> line.substring(i + 1).toLong
        }.toMap
      finally in.close()
    }
  }

  private def writeTxns(dir: Path, txns: Map[String, Long]): Unit = {
    val out = fs.create(new Path(dir, "_graft_txn"), true)
    try out.write(txns.toSeq.sorted.map { case (a, b) => s"$a\t$b" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
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

  /** MERGE INTO t USING source — full clause family, see [[Merge]].
    * `txn` publishes a streaming batch marker atomically with the
    * merged data (see class doc). */
  def upsert(
      source: DataFrame,
      keys: Seq[String],
      whenMatchedUpdate: Map[String, Column],
      whenNotMatchedInsert: Boolean = true,
      insertDefaults: Map[String, Column] = Map.empty,
      whenNotMatchedBySourceSet: Map[String, Column] = Map.empty,
      txn: Option[(String, Long)] = None): Unit =
    overwrite(Merge.merge(read(), source, keys, whenMatchedUpdate,
      whenNotMatchedInsert, insertDefaults, whenNotMatchedBySourceSet), txn)

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
