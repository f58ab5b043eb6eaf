package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8
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
  * The marker key is an EPOCH — a random id stored in
  * `<checkpointDir>/graft_epoch`, created together with the streaming
  * checkpoint and destroyed with it. Resetting the checkpoint (a
  * routine op that restarts batch ids at 0) therefore also rotates the
  * epoch: markers from the previous checkpoint generation can never
  * swallow the new stream's batches — the failure mode of a
  * free-standing marker file.
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

  private def epochPath: Path = Paths.get(checkpointDir, "graft_epoch")

  /** Stable id of this checkpoint generation (created on first use,
    * wiped with the checkpoint). */
  private def epoch(): String = {
    if (!Files.exists(epochPath)) {
      Files.createDirectories(epochPath.getParent)
      val tmp = epochPath.resolveSibling("graft_epoch.tmp")
      Files.write(tmp, java.util.UUID.randomUUID().toString.getBytes(UTF_8))
      try Files.move(tmp, epochPath, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp) // lost a benign race; the winner's id stands
      }
    }
    new String(Files.readAllBytes(epochPath), UTF_8).trim
  }

  /** Highest batch id already committed in this checkpoint generation,
    * -1 before the first. */
  def lastCommitted: Long = table.lastTxn(epoch()).getOrElse(-1L)

  /** The foreachBatch body: `stream.writeStream.foreachBatch(sink.apply _)`.
    * Pass the SAME directory as `option("checkpointLocation", …)`. */
  def apply(batch: DataFrame, batchId: Long): Unit = {
    val ep = epoch()
    if (table.lastTxn(ep).exists(batchId <= _)) return // redelivery
    table.createIfNotExists()
    table.upsert(batch, keys, whenMatchedUpdate, txn = Some(ep -> batchId))
  }
}
