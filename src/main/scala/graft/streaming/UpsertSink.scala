package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame}
import graft.catalog.ParquetTable

/** Exactly-once streaming upsert — the foreachBatch CDC-consumption
  * pattern: each micro-batch of change rows is MERGEd into a target
  * table, and a committed-batch marker makes redelivery a no-op.
  *
  * Exactly-once holds for ARBITRARY merge updates, including
  * non-idempotent additive ones (`tgt + src`, the incremental-aggregate
  * pattern in [[graft.catalog.Merge.upsertOnly]]), because the marker
  * commits ATOMICALLY with the data: [[ParquetTable.upsert]] writes the
  * `(epoch → batchId)` marker into the staged directory and the single
  * directory rename publishes both (Delta's txn-version-in-commit
  * pattern). There is no crash point where the merged data is visible
  * but the marker is not, so a redelivered batch can never re-apply.
  *
  * A PARTITIONED target whose merge keys COVER the partition columns
  * uses [[ParquetTable.upsertInPartitions]], with the same marker
  * committed into each touched partition's directory by that
  * partition's own swap: a crash mid-batch leaves the marker in
  * exactly the partitions already merged, and the redelivered batch
  * skips those — exactly-once per partition, which composes to
  * exactly-once for the batch. This is how CDC lands in the 100 TB
  * InsertDate-partitioned target without a whole-table rewrite per
  * micro-batch. The key-coverage condition is what makes the routing
  * SEMANTICS-preserving: when the partition columns are part of the
  * merge key, a source row can only ever match inside its own
  * partition, so the partition-scoped merge equals the whole-table
  * merge row for row. Keys that do NOT cover the partition columns
  * (a source row for key k on day2 must update k's existing row on
  * day1) fall back to the whole-table upsert — still exactly-once via
  * the root marker's atomic swap, just not partition-pruned. So do
  * keys that are EXACTLY the partition columns (a daily-rollup table
  * keyed on InsertDate alone): the partition-scoped merge matches on
  * the residual non-partition keys, and that set would be empty.
  *
  * The marker key is an EPOCH — a random id stored in
  * `<checkpointDir>/graft_epoch`, created together with the streaming
  * checkpoint and destroyed with it. Resetting the checkpoint (a
  * routine op that restarts batch ids at 0) therefore also rotates the
  * epoch: markers from the previous checkpoint generation can never
  * swallow the new stream's batches — the failure mode of a
  * free-standing marker file. The epoch file lives wherever the
  * checkpoint lives: it is resolved through the Hadoop FileSystem API,
  * so an `hdfs://`/`s3a://` checkpointLocation — the normal production
  * setting — works the same as a local path.
  *
  * This is the reference's BatchId bookkeeping
  * (modules/auto_loader_steps.py:397-418) hardened into the
  * Delta-style `txn`/foreachBatch idiom. The state is one integer per
  * (sink, epoch) — no growth with data volume. */
final class UpsertSink(
    table: ParquetTable,
    keys: Seq[String],
    whenMatchedUpdate: Map[String, Column],
    checkpointDir: String) {

  private def epochPath = new HPath(checkpointDir, "graft_epoch")
  private def epochFs = epochPath.getFileSystem(
    table.spark.sparkContext.hadoopConfiguration)

  /** Stable id of this checkpoint generation (created on first use,
    * wiped with the checkpoint). */
  private def epoch(): String = {
    val f = epochFs
    if (!f.exists(epochPath)) {
      f.mkdirs(epochPath.getParent)
      val tmp = new HPath(checkpointDir,
        s"graft_epoch.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
      finally out.close()
      // rename-if-absent through FileContext: with no Rename.OVERWRITE
      // option the rename FAILS on an existing destination on every
      // FileSystem — FileSystem.rename on RawLocalFileSystem clobbers
      // POSIX-style, which would let a racing second initializer rotate
      // the epoch AFTER the winner already read it. Losing the race is
      // benign: drop the tmp, read the winner's id below.
      try
        org.apache.hadoop.fs.FileContext
          .getFileContext(epochPath.toUri,
            table.spark.sparkContext.hadoopConfiguration)
          .rename(tmp, epochPath)
      catch { case _: java.io.IOException => f.delete(tmp, false) }
    }
    val in = f.open(epochPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** HIGH-WATER mark of this checkpoint generation: the highest batch
    * id any marker (root or partition-local) carries, -1 before the
    * first. For the whole-table route this IS "batch N is durable".
    * For the partition-scoped route it means "batch N REACHED at least
    * one partition": a crash mid-batch can leave other partitions a
    * batch behind until the engine redelivers and the per-partition
    * markers reconcile them — so treat it as progress telemetry, not a
    * durability gate (the durability story is the per-partition
    * markers themselves). */
  def lastCommitted: Long =
    table.lastTxnAcrossPartitions(epoch()).getOrElse(-1L)

  /** Partition-scoped merges are only semantics-preserving when a row's
    * merge key pins its partition (see class doc) — AND the key set
    * must carry at least one non-partition column, because the
    * per-partition merge matches rows on exactly those residual keys
    * (keys = the partition columns alone, e.g. a daily-rollup table
    * keyed on InsertDate, would leave it nothing to match on; that
    * shape takes the whole-table route, which handles it fine). */
  private def partitionScoped: Boolean =
    table.partitionCols.nonEmpty &&
      table.partitionCols.forall(p => keys.exists(_.equalsIgnoreCase(p))) &&
      keys.exists(k => !table.partitionCols.exists(_.equalsIgnoreCase(k)))

  /** The foreachBatch body: `stream.writeStream.foreachBatch(sink.apply _)`.
    * Pass the SAME directory as `option("checkpointLocation", …)`. */
  def apply(batch: DataFrame, batchId: Long): Unit = {
    val ep = epoch()
    if (partitionScoped) {
      // a batch that committed earlier through the WHOLE-TABLE route
      // (e.g. a sink redeployed across a routing change) carries only
      // the root marker — which is always a sound skip signal, so
      // consult it before the per-partition ones
      if (table.lastTxn(ep).exists(batchId <= _)) return
      // per-partition markers: redelivery skips exactly the partitions
      // the crashed attempt already swapped
      table.createIfNotExists()
      table.upsertInPartitions(batch, keys, whenMatchedUpdate,
        txn = Some(ep -> batchId))
    } else {
      if (table.lastTxn(ep).exists(batchId <= _)) return // redelivery
      table.createIfNotExists()
      table.upsert(batch, keys, whenMatchedUpdate, txn = Some(ep -> batchId))
    }
  }
}
