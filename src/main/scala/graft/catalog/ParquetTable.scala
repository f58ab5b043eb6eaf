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
    val schema: StructType,
    val partitionCols: Seq[String] = Nil,
    val writeOptions: Map[String, String] = Map.empty) {

  require(partitionCols.forall(schema.fieldNames.contains),
    s"partition columns ${partitionCols.mkString(",")} must be in the schema")

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dest = new Path(path)
  private def stagePath = new Path(path + ".__stage")
  private def oldPath = new Path(path + ".__old")
  // Underscore prefix: invisible to Spark's file listing and partition
  // discovery, so in-flight partition stages never pollute a read.
  private def partStageRoot = new Path(dest, "_pstage")
  private def partOldRoot = new Path(dest, "_pold")

  /** Schema of the data FILES: partition column values live in the
    * directory names, not in the files (hive layout). */
  private def dataSchema: StructType =
    StructType(schema.filterNot(f => partitionCols.contains(f.name)))

  /** Roll back an interrupted swap: live dir absent + `.__old` present
    * means the crash hit between the two renames — restore `.__old`.
    * Same per partition: a copy parked under `_pold` whose live
    * partition dir is absent is restored; one whose live dir exists was
    * superseded and is dropped. Finally sweep `_pstage`: anything under
    * it (half-written stages, trash parked by [[deletePartitions]]) is
    * garbage from an interrupted op — single-writer means no other op
    * is mid-flight when recover() runs — and left alone it accumulates
    * dead bytes forever at 100 TB scale. */
  private def recover(): Unit = {
    val f = fs
    if (!f.exists(dest) && f.exists(oldPath) && !f.rename(oldPath, dest))
      throw new java.io.IOException(s"swap recovery failed for $path")
    // dest present AND .__old present = a swap (or migrateToHiveLayout)
    // crashed between its final rename and the reclaim — the parked
    // copy is superseded garbage. Without this sweep a table mutated
    // only through partition-scoped ops afterwards would keep a
    // FULL-SIZE stale copy forever.
    else if (f.exists(dest) && f.exists(oldPath))
      f.delete(oldPath, true)
    if (partitionCols.nonEmpty && f.exists(partOldRoot)) {
      // listStatus paths come back scheme-qualified; relativize against
      // the equally-qualified root or the relative path is garbage
      val qRoot = f.makeQualified(partOldRoot).toUri
      dirsAtDepth(partOldRoot, partitionCols.size).foreach { parked =>
        val rel = qRoot.relativize(f.makeQualified(parked).toUri).getPath
        val live = new Path(dest, rel)
        if (!f.exists(live)) {
          f.mkdirs(live.getParent)
          if (!f.rename(parked, live))
            throw new java.io.IOException(s"partition recovery failed for $live")
        } else f.delete(parked, true)
      }
      f.delete(partOldRoot, true)
    }
    if (partitionCols.nonEmpty && f.exists(partStageRoot))
      f.delete(partStageRoot, true)
    checkLayout(f)
  }

  /** A partitioned table must not have plain data files at its root: a
    * table written by an older unpartitioned build would make
    * [[deletePartitions]] silently no-op (the daily idempotency delete
    * stops deleting → duplicates) and the first partitioned append
    * would create a mixed flat+hive layout that breaks reads. Fail
    * loudly BEFORE any mutation instead; [[migrateToHiveLayout]] is the
    * one-time fix. */
  private def checkLayout(f: org.apache.hadoop.fs.FileSystem): Unit =
    if (partitionCols.nonEmpty && f.exists(dest) &&
        f.listStatus(dest).exists(st => st.isFile && isDataFile(st.getPath)))
      throw new IllegalStateException(
        s"table $name at $path is partitioned by ${partitionCols.mkString(",")} " +
          "but has flat data files at its root (legacy unpartitioned layout); " +
          "run migrateToHiveLayout() once before using it")

  private def isDataFile(p: Path): Boolean =
    !p.getName.startsWith("_") && !p.getName.startsWith(".")

  /** One-time migration of a legacy flat (unpartitioned) layout into
    * the hive layout [[partitionCols]] demands: rewrite the flat files
    * — which carry the partition columns as ordinary data columns —
    * into partition directories, staged + swapped like any other
    * mutation. No-op when the layout is already hive. */
  def migrateToHiveLayout(): Unit = {
    val f = fs
    // Roll a pending whole-table swap back FIRST (recover()'s opening
    // move, inlined because recover() would also run checkLayout and
    // throw on the very legacy layout this method exists to fix): a
    // crash during a previous migrateToHiveLayout between its two
    // renames leaves dest absent and the legacy tree parked at .__old —
    // without this, the retry would see "no table" and silently skip
    // the migration it was called to redo.
    if (!f.exists(dest) && f.exists(oldPath) && !f.rename(oldPath, dest))
      throw new java.io.IOException(s"recovery failed for $path")
    if (partitionCols.isEmpty || !f.exists(dest) ||
        !f.listStatus(dest).exists(st => st.isFile && isDataFile(st.getPath)))
      return
    val carried = readTxns(dest)
    val cur = spark.read.schema(schema).parquet(path)
    align(cur).write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(stagePath.toString)
    if (carried.nonEmpty) writeTxns(stagePath, carried)
    if (f.exists(oldPath)) f.delete(oldPath, true)
    if (!f.rename(dest, oldPath))
      throw new java.io.IOException(s"swap set-aside failed for $path")
    if (!f.rename(stagePath, dest))
      throw new java.io.IOException(s"atomic swap failed for $path")
    f.delete(oldPath, true)
  }

  private def dirsAtDepth(root: Path, depth: Int): Seq[Path] =
    if (depth == 0) Seq(root)
    else if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(s => dirsAtDepth(s.getPath, depth - 1))

  /** `col=value[/col=value…]` path for a leading subset of the partition
    * columns. Values must not need hive path-escaping (true for the
    * date/int partition values this engine writes). */
  private def partitionRel(values: Seq[(String, String)]): String = {
    require(values.nonEmpty && values.map(_._1) == partitionCols.take(values.size),
      s"partition spec ${values.map(_._1)} must be a prefix of $partitionCols")
    values.map { case (c, v) =>
      require(v.nonEmpty && !v.exists(ch => ch < ' ' || "\"#%'*/:=?\\{}[]^".contains(ch)),
        s"partition value '$v' would need hive escaping")
      s"$c=$v"
    }.mkString("/")
  }

  def exists: Boolean = { recover(); fs.exists(dest) }

  /** Create as empty if the directory is absent
    * (schema/schemas/2_header_configuration.py:135-146 bootstrap).
    * CREATE TABLE is a pure driver-side metadata operation — mkdir, no
    * Spark job: the schema lives in this table object and [[read]]
    * pins it explicitly, so an empty directory IS an empty table.
    * (Writing a 0-row DataFrame instead costs a full job + commit
    * protocol; the catalog bootstrap creates seven tables before any
    * data moves, and on a real cluster DDL should never wait on
    * executors.) */
  def createIfNotExists(): this.type = {
    if (!exists) fs.mkdirs(dest)
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

  private def writer(df: DataFrame) = {
    // writeOptions flow into every write path (append, overwrite,
    // compact, partition rewrites) — an INDEX table sets a small
    // `parquet.block.size` here so a key-sorted layout yields many
    // tightly-bounded row groups and a pushed IN filter prunes the
    // serve scan to ~the matching pages regardless of index size.
    val w = writeOptions.foldLeft(align(df).write) {
      case (acc, (k, v)) => acc.option(k, v)
    }
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  def append(df: DataFrame): Unit = {
    recover()
    writer(df).mode("append").parquet(path)
  }

  def overwrite(df: DataFrame): Unit = overwrite(df, None)

  /** Overwrite, optionally publishing `txn = (appId, batchId)` in the
    * same atomic rename as the data. On a partitioned table the staged
    * tree also inherits every live partition's local `_graft_txn`
    * marker (for partitions that still exist after the rewrite): a
    * whole-table compaction/UPDATE/DELETE between stream batches must
    * not reset [[upsertInPartitions]]' per-partition dedup state — the
    * same carry-forward contract the root marker and
    * [[overwritePartition]] already keep. A partition the rewrite
    * dropped entirely takes its marker with it (its data is explicitly
    * gone; there is no state left to protect). */
  def overwrite(df: DataFrame, txn: Option[(String, Long)]): Unit = {
    recover()
    val f = fs
    val carried = readTxns(dest) // before any mutation of dest
    val partCarried: Seq[(String, Map[String, Long])] =
      if (partitionCols.isEmpty) Nil
      else dirsAtDepth(dest, partitionCols.size).flatMap { live =>
        val marks = readTxns(live)
        if (marks.isEmpty) None else Some(partitionRelOf(live) -> marks)
      }
    writer(df).mode("overwrite").parquet(stagePath.toString)
    val txns = txn.fold(carried)(carried + _)
    if (txns.nonEmpty) writeTxns(stagePath, txns)
    partCarried.foreach { case (rel, marks) =>
      val staged = new Path(stagePath, rel)
      if (f.exists(staged)) writeTxns(staged, marks)
    }
    if (f.exists(oldPath)) f.delete(oldPath, true) // stale garbage only
    if (f.exists(dest) && !f.rename(dest, oldPath))
      throw new java.io.IOException(s"swap set-aside failed for $path")
    if (!f.rename(stagePath, dest))
      throw new java.io.IOException(s"atomic swap failed for $path")
    f.delete(oldPath, true)
  }

  /** `a=1/b=2` relative path of a full partition directory — the last
    * [[partitionCols]].size segments of `dir` (inverse of
    * [[dirsAtDepth]]'s walk from any root). */
  private def partitionRelOf(dir: Path): String = {
    val segs = List.newBuilder[String]
    var cur = dir
    (0 until partitionCols.size).foreach { _ =>
      segs += cur.getName; cur = cur.getParent
    }
    segs.result().reverse.mkString("/")
  }

  /** Highest batch id atomically committed with the data for `appId`,
    * if any batch from that writer has committed. */
  def lastTxn(appId: String): Option[Long] = { recover(); readTxns(dest).get(appId) }

  /** Highest batch id committed atomically with ONE partition's data —
    * the per-partition marker [[upsertInPartitions]] publishes. */
  def lastTxnInPartition(values: Seq[(String, String)], appId: String): Option[Long] = {
    recover()
    readTxns(new Path(dest, partitionRel(values))).get(appId)
  }

  /** Highest batch id committed by `appId` ANYWHERE in the table: the
    * root marker plus every partition-local marker. The monitoring
    * answer to "how far has this stream gotten" regardless of whether
    * batches landed via whole-table swaps or partition-scoped merges.
    * O(#partitions) listing — a status probe, not a hot-path call. */
  def lastTxnAcrossPartitions(appId: String): Option[Long] = {
    recover()
    val marks = readTxns(dest).get(appId).toSeq ++ (
      if (partitionCols.isEmpty) Nil
      else dirsAtDepth(dest, partitionCols.size)
        .flatMap(d => readTxns(d).get(appId)))
    marks.reduceOption(_ max _)
  }

  private def readTxns(dir: Path): Map[String, Long] = {
    val f = fs
    val file = new Path(dir, "_graft_txn")
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

  /** Partition-level DELETE: atomically unhooks the matching partition
    * directory (rename into a hidden trash, then reclaim) — an O(1)
    * metadata operation however large the partition. `values` may be a
    * leading subset of [[partitionCols]]. At 100 TB this is the ONLY
    * acceptable shape for "delete day X": the predicate form rewrites
    * the whole table. No-op if the partition is absent. */
  def deletePartitions(values: Seq[(String, String)]): Unit = {
    recover()
    val f = fs
    val live = new Path(dest, partitionRel(values))
    if (f.exists(live)) {
      val trash = new Path(partStageRoot, "trash/" + partitionRel(values))
      f.delete(trash, true)
      f.mkdirs(trash.getParent)
      if (!f.rename(live, trash))
        throw new java.io.IOException(s"partition delete failed for $live")
      // sweep the whole stage root: the trash copy plus the now-empty
      // scaffolding dirs (single writer — nothing else is in flight)
      f.delete(partStageRoot, true)
    }
  }

  /** Replace ONE partition's contents (full partition spec). The data
    * frame must carry [[dataSchema]]'s columns (partition values are
    * implied by the spec). Same crash-safe stage→park→rename→reclaim
    * dance as the whole-table swap, scoped to the partition dir.
    * Partition-local `_graft_txn` markers are carried forward (and
    * extended with `txn` if given) so a compaction or update between
    * stream batches never resets [[upsertInPartitions]]' dedup state —
    * the same contract [[overwrite]] keeps for the table-level marker. */
  def overwritePartition(values: Seq[(String, String)], df: DataFrame,
                         txn: Option[(String, Long)] = None): Unit = {
    require(values.size == partitionCols.size,
      "overwritePartition needs the full partition spec")
    recover()
    val f = fs
    val rel = partitionRel(values)
    val stage = new Path(partStageRoot, rel)
    val parked = new Path(partOldRoot, rel)
    val live = new Path(dest, rel)
    val carried = readTxns(live) // before any mutation of the partition
    alignTo(dataSchema, df).write.mode("overwrite").parquet(stage.toString)
    val txns = txn.fold(carried)(carried + _)
    if (txns.nonEmpty) writeTxns(stage, txns)
    if (f.exists(parked)) f.delete(parked, true)
    f.mkdirs(parked.getParent)
    if (f.exists(live) && !f.rename(live, parked))
      throw new java.io.IOException(s"partition set-aside failed for $live")
    f.mkdirs(live.getParent)
    if (!f.rename(stage, live))
      throw new java.io.IOException(s"partition swap failed for $live")
    f.delete(parked, true)
  }

  /** DELETE within one partition: reads and rewrites ONLY that
    * partition's files. `pred` must reference data columns only — the
    * partition columns are fixed by `values`. This is the compensating-
    * delete shape: pull batch N back out of today's partition without
    * touching any other day. */
  def deleteWhereInPartition(values: Seq[(String, String)], pred: Column): Unit = {
    require(values.size == partitionCols.size,
      "deleteWhereInPartition needs the full partition spec")
    recover()
    val live = new Path(dest, partitionRel(values))
    if (fs.exists(live)) {
      val cur = spark.read.schema(dataSchema).parquet(live.toString)
      overwritePartition(values, cur.filter(!coalesce(pred, lit(false))))
    }
  }

  /** The literal rendered exactly as the hive directory name renders
    * it. Only two shapes are trusted: a literal already OF the
    * partition column's type, or a string literal (which comparison
    * coercion would cast to the column type anyway) — normalized
    * through the column type so "2026-8-13" and "2026-08-13" land on
    * the same directory. Any other type (e.g. a timestamp literal
    * against a date column, whose equality semantics are NOT
    * date-truncation) refuses to route. */
  private def litString(
      c: String,
      l: org.apache.spark.sql.catalyst.expressions.Literal): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CLit}
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val colType = schema(c).dataType
    val typed =
      if (l.dataType == colType) Some(l)
      else if (l.dataType == org.apache.spark.sql.types.StringType)
        Option(Cast(l, colType, tz).eval(null)).map(CLit(_, colType))
      else None
    typed.flatMap(t =>
      Option(Cast(t, org.apache.spark.sql.types.StringType, tz).eval(null))
        .map(_.toString))
  }

  /** Equality conjuncts on partition columns inside `pred`, extracted
    * so generic DML can prune like Delta does: the reference issues
    * `DELETE … WHERE InsertDate = CURRENT_DATE()` as a plain predicate
    * (`notebooks/Data Ingestion Helper.py:140`) and expects the engine —
    * not the caller — to turn it into a partition-scoped operation.
    * Returns the pinned `(col, value)` pairs in [[partitionCols]] order
    * plus whether the WHOLE predicate was consumed by those pins (no
    * residual → the partition directory itself is the delete target).
    * Conservative: anything unrecognizable (mixed ORs, casts around
    * the attribute, conflicting pins, values needing hive escaping)
    * yields None and the caller falls back to the full rewrite —
    * routing must never change semantics. */
  private def pinnedSpec(pred: Column): Option[(Seq[(String, String)], Boolean)] = {
    import org.apache.spark.sql.graft.{AttrEqLit, ColumnBridge}
    if (partitionCols.isEmpty) return None
    val cs = ColumnBridge.conjuncts(pred)
    val pins = scala.collection.mutable.Map.empty[String, String]
    var consumed = 0
    cs.foreach {
      case AttrEqLit(name, l) =>
        partitionCols.find(_.equalsIgnoreCase(name)).foreach { c =>
          litString(c, l).foreach { v =>
            if (pins.get(c).exists(_ != v)) return None // contradiction
            pins(c) = v; consumed += 1
          }
        }
      case _ => ()
    }
    if (pins.isEmpty) return None
    // pins must form a leading prefix of partitionCols for a directory path
    val ordered = partitionCols.takeWhile(pins.contains).map(c => c -> pins(c))
    if (ordered.size != pins.size) return None
    if (scala.util.Try(partitionRel(ordered)).isFailure) return None
    Some((ordered, consumed == cs.size))
  }

  /** The predicate as a pure membership pin on the FIRST partition
    * column — `InsertDate IN ('a','b')`, or the OR-of-equalities
    * spelling of the same thing. Each value is then an O(1)
    * leading-prefix directory unhook (Delta prunes the IN form of the
    * compensating delete the same way). Conservative like
    * [[pinnedSpec]]: any extra conjunct, other column, unrenderable or
    * null value refuses to route. */
  private def inPinnedValues(pred: Column): Option[Seq[String]] = {
    import org.apache.spark.sql.graft.{AttrInLits, ColumnBridge}
    if (partitionCols.isEmpty) return None
    ColumnBridge.conjuncts(pred) match {
      case scala.collection.Seq(AttrInLits(name, lits))
          if partitionCols.head.equalsIgnoreCase(name) && lits.nonEmpty =>
        val head = partitionCols.head
        val vs = lits.map(l => litString(head, l))
        if (!vs.forall(_.isDefined)) None
        else {
          val values = vs.flatten.distinct
          if (values.forall(v =>
            scala.util.Try(partitionRel(Seq(head -> v))).isSuccess)) Some(values)
          else None
        }
      case _ => None
    }
  }

  /** The partition's files with the partition-column values synthesized
    * back as columns (hive reads do the same from the dir name) — lets
    * a generic predicate that mentions partition columns evaluate
    * against a single partition's data. */
  private def readPartitionWithValues(values: Seq[(String, String)]): DataFrame =
    values.foldLeft(
      spark.read.schema(dataSchema).parquet(new Path(dest, partitionRel(values)).toString)) {
      case (df, (c, v)) =>
        df.withColumn(c, lit(v).cast(schema(c).dataType))
    }

  /** UPDATE t SET <set> WHERE <pred> — read-modify-rewrite. When `pred`
    * pins every partition column with an equality (`InsertDate = X AND
    * …`) — or, on a single-column-partitioned table, is a pure
    * membership pin (`InsertDate IN (X, Y)` / its OR spelling) — and
    * `set` leaves the partition columns alone, only the pinned
    * partitions are read and rewritten — Delta's partition pruning for
    * generic DML, so callers don't have to know about
    * [[updateInPartition]]. Anything else rewrites the whole table. */
  def update(pred: Column, set: Map[String, Column]): Unit = {
    def rewrite(cur: DataFrame): DataFrame =
      cur.select(cur.columns.map { c =>
        set.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))
      }.toSeq: _*)
    val setTouchesPartition =
      set.keys.exists(k => partitionCols.exists(_.equalsIgnoreCase(k)))
    val routed =
      if (setTouchesPartition) false
      else inPinnedValues(pred) match {
        case Some(values) if partitionCols.size == 1 =>
          recover()
          values.foreach { v =>
            val spec = Seq(partitionCols.head -> v)
            if (fs.exists(new Path(dest, partitionRel(spec)))) {
              val cur = readPartitionWithValues(spec)
              overwritePartition(spec, rewrite(cur).drop(partitionCols: _*))
            }
          }
          true
        case _ => pinnedSpec(pred) match {
          case Some((values, _)) if values.size == partitionCols.size =>
            recover()
            if (fs.exists(new Path(dest, partitionRel(values)))) {
              val cur = readPartitionWithValues(values)
              overwritePartition(values, rewrite(cur).drop(partitionCols: _*))
            }
            true
          case _ => false
        }
      }
    if (!routed) overwrite(rewrite(read()))
  }

  /** UPDATE scoped to one partition: reads and rewrites ONLY that
    * partition's files. `pred` and `set` must reference data columns
    * only. The 100 TB shape for "fix day X": the other days' files are
    * never opened. */
  def updateInPartition(values: Seq[(String, String)], pred: Column,
                        set: Map[String, Column]): Unit = {
    require(values.size == partitionCols.size,
      "updateInPartition needs the full partition spec")
    recover()
    val live = new Path(dest, partitionRel(values))
    if (fs.exists(live)) {
      val cur = spark.read.schema(dataSchema).parquet(live.toString)
      overwritePartition(values, cur.select(cur.columns.map { c =>
        set.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))
      }.toSeq: _*))
    }
  }

  /** DELETE FROM t WHERE <pred> — anti-filter + rewrite, with Delta-
    * style partition pruning for generic predicates: a pred that IS a
    * partition pin (`InsertDate = X`, possibly a leading prefix of the
    * partition columns) becomes the O(1) directory unhook of
    * [[deletePartitions]]; a membership pin (`InsertDate IN (X, Y)` or
    * its OR-of-equalities spelling) becomes one unhook per value; a
    * pred that pins every partition column AND carries residual
    * conditions rewrites only that partition. At 100 TB this is the
    * difference between the reference's daily
    * `DELETE … WHERE InsertDate = CURRENT_DATE()` touching one
    * directory and rewriting the table. */
  def deleteWhere(pred: Column): Unit = inPinnedValues(pred) match {
    case Some(values) =>
      values.foreach(v => deletePartitions(Seq(partitionCols.head -> v)))
    case None => pinnedSpec(pred) match {
      case Some((values, true)) =>
        deletePartitions(values)
      case Some((values, false)) if values.size == partitionCols.size =>
        recover()
        if (fs.exists(new Path(dest, partitionRel(values)))) {
          val cur = readPartitionWithValues(values)
          overwritePartition(values,
            cur.filter(!coalesce(pred, lit(false))).drop(partitionCols: _*))
        }
      case _ =>
        overwrite(read().filter(!coalesce(pred, lit(false))))
    }
  }

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

  /** Total DATA bytes currently stored under the table directory —
    * `_`/`.`-prefixed sidecars (txn markers, in-flight stages, success
    * files) are excluded so derived sizing (compaction file counts)
    * reflects actual data, not bookkeeping. */
  def tableBytes: Long = {
    recover()
    def sum(p: Path): Long = fs.listStatus(p).map { st =>
      if (!isDataFile(st.getPath)) 0L
      else if (st.isDirectory) sum(st.getPath)
      else st.getLen
    }.sum
    if (fs.exists(dest)) sum(dest) else 0L
  }

  /** Number of DATA files currently stored under the table directory —
    * the companion of [[tableBytes]] (same sidecar exclusion: txn
    * markers, in-flight stages and success files don't count), used by
    * compaction-cadence probes/specs to assert file counts stay
    * bounded. An ad-hoc `*.parquet` walk would miscount during a
    * compaction swap (the staged dir is visible until the rename). */
  def dataFileCount: Int = {
    recover()
    def cnt(p: Path): Int = fs.listStatus(p).map { st =>
      if (!isDataFile(st.getPath)) 0
      else if (st.isDirectory) cnt(st.getPath)
      else 1
    }.sum
    if (fs.exists(dest)) cnt(dest) else 0
  }

  /** OPTIMIZE [ZORDER BY cols] equivalent: compact small files and
    * cluster rows so min/max parquet stats prune on the z columns
    * (modules/auto_loader_steps.py:481-498). On a cluster the
    * repartitionByRange gives range-partitioned files whose column stats
    * are disjoint — the parquet-native analogue of z-ordering.
    *
    * `targetPartitions <= 0` (the default) derives the output partition
    * count from the CURRENT table size — one task/file per
    * `targetFileBytes` — so a 100 TB table compacts to ~800k properly
    * sized files instead of one task writing one giant file.
    *
    * `remap` rewrites the named columns during the compaction (values
    * cast to the column's schema type) — the FOLD hook for bookkeeping
    * partition columns: a table partitioned by a per-batch id
    * ([[graft.streaming.TieredIndex]]'s `mig`) collapses its historical
    * partitions into one here, or compaction's output would re-split by
    * every batch id ever seen and the file count would grow with batch
    * count instead of staying bounded. */
  def compact(zorderCols: Seq[String] = Nil, targetPartitions: Int = 0,
              targetFileBytes: Long = 128L * 1024 * 1024,
              remap: Map[String, Column] = Map.empty): Unit = {
    val parts =
      if (targetPartitions > 0) targetPartitions
      else math.max(1, math.ceil(tableBytes.toDouble / targetFileBytes).toInt)
    val cur = remap.foldLeft(read()) { case (df, (c, v)) =>
      df.withColumn(c, v.cast(schema(c).dataType))
    }
    // Partitioned writes require rows ordered by the partition columns
    // within each task; sorting by (partitionCols ++ zorderCols) meets
    // that requirement so the writer adds no extra (non-stable) sort
    // that would scramble the z-clustering inside each partition dir.
    val arranged =
      if (zorderCols.nonEmpty)
        cur.repartitionByRange(parts, zorderCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ zorderCols).map(col): _*)
      else cur.coalesce(parts)
    overwrite(arranged)
  }

  /** MERGE that rewrites ONLY the partitions the source touches. The
    * source must carry the partition columns, and a row's partition
    * value must equal that of the target row it updates (true whenever
    * the partition column is part of the key or functionally dependent
    * on it — the standard partitioned-MERGE contract). Each touched
    * partition is merged and swapped independently: a CDC batch that
    * touches 2 of 800 days reads and rewrites 2 directories, where
    * [[upsert]] rewrites the table.
    *
    * NOT atomic across partitions (one swap per partition) — but WITH
    * `txn`, exactly-once still holds end to end: the `(appId →
    * batchId)` marker is committed into EACH partition's directory by
    * that partition's own atomic swap, so a crash mid-batch leaves some
    * partitions carrying the marker and some not, and the redelivered
    * batch skips exactly the partitions already done. Non-idempotent
    * (additive) merges therefore never double-apply — the partitioned
    * counterpart of [[upsert]]'s table-level marker, used by
    * [[graft.streaming.UpsertSink]] for CDC into a partitioned target.
    *
    * All partition specs are validated BEFORE the first swap (null
    * partition values, values needing hive escaping), so an invalid
    * source fails the whole call cleanly instead of after some
    * partitions were already rewritten. */
  def upsertInPartitions(source: DataFrame, keys: Seq[String],
      whenMatchedUpdate: Map[String, Column],
      whenNotMatchedInsert: Boolean = true,
      insertDefaults: Map[String, Column] = Map.empty,
      txn: Option[(String, Long)] = None): Unit = {
    require(partitionCols.nonEmpty, "upsertInPartitions needs a partitioned table")
    // case-INSENSITIVE matching throughout, like Spark's own column
    // resolution (and like UpsertSink's routing check — a key spelled
    // "insertdate" against partition column "InsertDate" must behave
    // identically on both sides of that boundary)
    require(partitionCols.forall(p =>
      source.columns.exists(_.equalsIgnoreCase(p))),
      s"source must carry partition columns ${partitionCols.mkString(",")}")
    val effectiveKeys =
      keys.filterNot(k => partitionCols.exists(_.equalsIgnoreCase(k)))
    require(effectiveKeys.nonEmpty,
      "keys must include at least one non-partition column")
    recover()
    // touched partitions: a small driver fetch (days in a CDC batch)
    val touched = source
      .select(partitionCols.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map(r => partitionCols.zipWithIndex.map { case (c, i) => c -> r.getString(i) })
    // validate every spec up front — fail before ANY partition swaps
    touched.foreach { values =>
      values.foreach { case (c, v) => require(v != null,
        s"null partition value for $c in upsertInPartitions source") }
      partitionRel(values.toSeq) // throws on values needing hive escaping
    }
    touched.foreach { values =>
      val alreadyApplied = txn.exists { case (appId, batchId) =>
        readTxns(new Path(dest, partitionRel(values.toSeq)))
          .get(appId).exists(batchId <= _)
      }
      if (!alreadyApplied) {
        val slice = values.foldLeft(source) { case (df, (c, v)) =>
          df.filter(col(c).cast("string") === v)
        }.drop(partitionCols: _*)
        val live = new Path(dest, partitionRel(values.toSeq))
        val cur =
          if (fs.exists(live)) spark.read.schema(dataSchema).parquet(live.toString)
          else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dataSchema)
        overwritePartition(values.toSeq, Merge.merge(cur, slice, effectiveKeys,
          whenMatchedUpdate, whenNotMatchedInsert, insertDefaults), txn)
      }
    }
  }

  /** OPTIMIZE one partition: compact and z-cluster ONLY that
    * partition's files (sized from the PARTITION's bytes). The daily
    * post-load compaction shape — at 100 TB, re-optimizing the whole
    * InsertDate-partitioned target after loading one day is a
    * full-table rewrite per day. */
  def compactPartition(values: Seq[(String, String)],
                       zorderCols: Seq[String] = Nil,
                       targetPartitions: Int = 0,
                       targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(values.size == partitionCols.size,
      "compactPartition needs the full partition spec")
    recover()
    val live = new Path(dest, partitionRel(values))
    if (fs.exists(live)) {
      val files = fs.listStatus(live).filter(st => st.isFile && isDataFile(st.getPath))
      val bytes = files.map(_.getLen).sum
      val parts =
        if (targetPartitions > 0) targetPartitions
        else math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      // PURE compaction already at (or under) the target file count is
      // a no-op — the many-small-files problem it exists to fix isn't
      // present, and paying a full partition rewrite after every load
      // when the load already wrote `parts` files makes the post-load
      // OPTIMIZE pure overhead (round-5 finding: +41% on the ingest
      // path for a no-op). ZORDER is different: file count says nothing
      // about row clustering (one merge-ordered file still has
      // interleaved min/max stats on the z-columns), so an explicit
      // zorder request always rewrites — Delta's OPTIMIZE ZORDER
      // stance.
      if (zorderCols.isEmpty && files.length <= parts) return
      val cur = spark.read.schema(dataSchema).parquet(live.toString)
      val arranged =
        if (zorderCols.nonEmpty)
          cur.repartitionByRange(parts, zorderCols.map(col): _*)
            .sortWithinPartitions(zorderCols.map(col): _*)
        else cur.coalesce(parts)
      overwritePartition(values, arranged)
    }
  }

  private def align(df: DataFrame): DataFrame = alignTo(schema, df)

  private def alignTo(s: StructType, df: DataFrame): DataFrame = {
    val cols = s.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name))
    df.select(cols.toSeq: _*)
  }
}

object ParquetTable {
  def apply(spark: SparkSession, name: String, path: String, schema: StructType,
            partitionCols: Seq[String] = Nil,
            writeOptions: Map[String, String] = Map.empty): ParquetTable =
    new ParquetTable(spark, name, path, schema, partitionCols, writeOptions)

  /** Write options for a stored SECONDARY INDEX (band buckets, seed
    * postings): 1 MiB row groups instead of the 128 MiB data default.
    * Index rows are small and served through a pushed key filter, so
    * many small, key-sorted row groups are what makes footer min/max
    * pruning fine-grained enough that a batch of K keys reads ~K row
    * groups no matter how large the index has grown. */
  val IndexWriteOptions: Map[String, String] =
    Map("parquet.block.size" -> (1024 * 1024).toString)
}
