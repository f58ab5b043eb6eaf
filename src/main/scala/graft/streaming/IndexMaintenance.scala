package graft.streaming

import graft.catalog.ParquetTable

/** Maintenance CADENCE for stored stream-served indexes — the
  * machinery that keeps a long-running hybrid/BM25/components serve
  * from degrading as per-batch appends fragment the stage table (every
  * micro-batch lands one file set; footer/metadata reads grow with
  * file count — the named residue in the r12 serve-exponent probes).
  *
  * [[maybeCompact]] fires [[graft.catalog.ParquetTable.compact]] every
  * `every` committed batches from inside the caller's foreachBatch, so
  * compaction is part of the PIPELINE, not an operator's cron job:
  * the r12 entries documented "compact every N batches in production"
  * as prose; this makes it code. Safety is already spec-pinned
  * (StreamingSpec's byte-identity test: compaction changes no served
  * pair) and the long-run StreamProbe row measures the effect (file
  * count bounded, serve time flat across a 40-batch run).
  *
  * Crash-safety note: compaction is an atomic swap of an equivalent
  * relation ([[graft.catalog.ParquetTable.overwrite]] stages then
  * swaps), so a batch REPLAYED after a crash between append and
  * compact re-appends its rows (the entries' pair recovery is
  * replay-idempotent by construction) and simply compacts again — the
  * trigger needs no bookkeeping beyond the batch id Spark already
  * redelivers. */
object IndexMaintenance {

  /** Compact `table` clustered by `zorderCols` when `batchId` closes a
    * cadence window of `every` batches (ids `every-1`, `2*every-1`, …
    * — so a 2-batch fixture under the default production cadence never
    * pays a rewrite, while a long run compacts on schedule). Returns
    * whether compaction ran. `every <= 0` disables the cadence.
    * `remap` passes through to [[graft.catalog.ParquetTable.compact]]
    * (the bookkeeping-partition fold hook). */
  def maybeCompact(table: ParquetTable, batchId: Long, every: Int,
                   zorderCols: Seq[String],
                   remap: Map[String, org.apache.spark.sql.Column] =
                     Map.empty): Boolean = {
    val fire = every > 0 && batchId % every == (every - 1).toLong
    if (fire) table.compact(zorderCols, remap = remap)
    fire
  }

  /** Cadence maintenance for the INCREMENTAL-COMPONENTS pair: fold the
    * forwarding chains into the label table
    * ([[graft.plans.IncrementalComponents.compacted]] — the
    * q_components_compact machinery) and truncate the forwards. This is
    * SEMANTIC maintenance, not just file compaction: without it the
    * resolve closure deepens with every merge batch and the composed
    * dedup pipeline's per-batch cost grows with history (the r14
    * long-run probe measured 2.9 → 5.4 s over 40 batches with plain
    * file compaction; folding keeps it flat). The fold rewrite IS the
    * file compaction too — one doc-sorted overwrite.
    *
    * Crash-safe by IDEMPOTENCY rather than atomicity across the two
    * tables: folded labels contain no old roots, so resolving through
    * stale forwards after a crash between the overwrite and the
    * truncate changes nothing, and a replayed fold folds the same
    * fixpoint again. */
  def maybeFoldComponents(labels: ParquetTable, forwards: ParquetTable,
                          batchId: Long, every: Int): Boolean = {
    val fire = every > 0 && batchId % every == (every - 1).toLong
    if (fire) {
      val (cl, _) = graft.plans.IncrementalComponents.compacted(
        labels.read(), forwards.read())
      labels.overwrite(graft.plans.Materialize.stage(cl)
        .repartition(org.apache.spark.sql.functions.col("doc_id"))
        .sortWithinPartitions("doc_id"))
      forwards.truncate()
    }
    fire
  }
}
