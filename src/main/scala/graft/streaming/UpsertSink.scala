package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Column, DataFrame}
import graft.catalog.ParquetTable

/** Exactly-once streaming upsert — the foreachBatch CDC-consumption
  * pattern: each micro-batch of change rows is MERGEd into a target
  * table, and a committed-batch marker makes redelivery a no-op.
  *
  * The exactly-once argument has two halves, and both are needed:
  *  - the MERGE itself is idempotent (upserting the same rows twice
  *    yields the same table), which covers a crash BETWEEN the table
  *    swap and the marker write;
  *  - the marker (written AFTER the swap, atomically via temp-file
  *    rename) short-circuits whole re-delivered batches, which covers
  *    Structured Streaming's at-least-once foreachBatch contract and
  *    saves the re-merge work on restart.
  *
  * This is the reference's BatchId bookkeeping
  * (modules/auto_loader_steps.py:397-418) hardened into the
  * Delta-style `txn`/foreachBatch idiom. The state is one integer per
  * sink — no growth with data volume. */
final class UpsertSink(
    table: ParquetTable,
    keys: Seq[String],
    whenMatchedUpdate: Map[String, Column],
    markerDir: String) {

  private def markerPath: Path = Paths.get(markerDir, "last_batch")

  /** Highest batch id already committed, -1 before the first. */
  def lastCommitted: Long =
    if (Files.exists(markerPath))
      new String(Files.readAllBytes(markerPath), StandardCharsets.UTF_8).trim.toLong
    else -1L

  private def commit(batchId: Long): Unit = {
    Files.createDirectories(markerPath.getParent)
    val tmp = markerPath.resolveSibling(s"last_batch.tmp")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, markerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The foreachBatch body: `stream.writeStream.foreachBatch(sink.apply _)`. */
  def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastCommitted) return // redelivery — already applied
    table.createIfNotExists()
    table.upsert(batch, keys, whenMatchedUpdate)
    commit(batchId)
  }
}
