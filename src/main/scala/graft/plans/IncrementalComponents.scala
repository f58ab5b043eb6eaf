package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL connected components — day-2 maintenance for the stored
  * duplicate-cluster labels, completing the maintenance pattern the
  * ANN index (q_ann_index_insert / q_ann_index_delete) and the BM25
  * index (q_bm25_index_stream) already follow: the expensive global
  * computation runs ONCE, and arriving evidence updates the stored
  * result with BATCH-bounded work instead of a recompute.
  *
  * Storage model — two append-only relations, NEVER rewritten on the
  * batch path (a parquet rewrite is corpus-sized; appends are
  * batch-sized):
  *
  *  - `labels(doc_id, comp_id)`: one row per node at the time it first
  *    appeared in a pair, comp_id = its component's min id AT INSERT.
  *    Written doc-sorted with small row groups
  *    ([[graft.catalog.ParquetTable.IndexWriteOptions]]) so the batch
  *    root-lookup's pushed doc-id `InSet` prunes the scan — the
  *    hybrid-dedup-index machinery.
  *  - `fwd(old_root, new_root)`: every merge appends forwarding edges
  *    from the roots that LOST to the component's new min. Labels are
  *    stale the moment a merge lands; READS resolve comp_id through
  *    the forwarding closure. fwd is sized by the merges since the
  *    last compaction (churn, not corpus) and compaction
  *    ([[compacted]]) folds it back to zero.
  *
  * Merge roots always decrease (the new root is the min over merged
  * components, and every forwarded root is some component's old min),
  * so the forwarding graph is a forest of chains/trees pointing at
  * minima — resolving it IS a connected-components run over the fwd
  * edge list, labeled by min: [[resolveForwards]] reuses the
  * large-star/small-star kernel (O(log diameter) rounds, so a
  * pathological chain of B batch merges resolves in ~log B rounds,
  * spec-pinned for 64-link chains in DedupSpec).
  *
  * Per-batch cost: one pruned labels read (batch endpoints), one fwd
  * read (churn-sized), a star-CC over the batch's ROOT graph
  * (batch-bounded), two appends. Nothing scales with the corpus.
  *
  * The same idea at reference scope: the reference's MERGE-maintained
  * control tables (`/root/reference/modules/merge_data.py`) keep a
  * stored relation current under arriving rows; this is that
  * day-2 stance applied to the dedup graph. */
object IncrementalComponents {

  /** Resolve the forwarding relation to its fixpoint: (old_root,
    * final_root) for every root appearing anywhere in `fwd` — the
    * transitive "where did my component's min end up". Star-CC over
    * the fwd edges labels every merge-tree by its min, which is
    * exactly the final root (merges only ever forward to smaller
    * ids). Empty fwd resolves to an empty map. */
  def resolveForwards(fwd: DataFrame): DataFrame =
    graft.text.Dedup.connectedComponentsStar(
      fwd.select(col("old_root").as("id_a"), col("new_root").as("id_b")))
      .select(col("id").as("old_root"), col("comp").as("final_root"))

  /** The serving view: stored labels with comp_id resolved through the
    * stored forwards. No hint on the resolution join — its build side
    * is churn-sized (merges since compaction), which AQE can check at
    * runtime; a static broadcast would pin an OOM on a high-churn
    * corpus. */
  def resolvedLabels(labels: DataFrame, fwd: DataFrame): DataFrame = {
    val res = resolveForwards(fwd)
    labels.join(res, labels("comp_id") === res("old_root"), "left")
      .select(labels("doc_id"),
        coalesce(col("final_root"), col("comp_id")).as("comp_id"))
  }

  /** The appends ONE batch of new pairs implies against the stored
    * state: returns (newLabels, newForwards) — rows to append to the
    * two tables. Nothing is rewritten and the stored relations are
    * only read: labels through a batch-endpoint-pruned scan, fwd in
    * full (churn-sized).
    *
    * Steps: (1) each batch endpoint's CURRENT root = its stored label
    * (own id if unseen) resolved through the forwards; (2) the batch's
    * pairs project to ROOT pairs, whose star-CC yields each touched
    * root's new min; (3) losers' forwarding edges and new nodes'
    * labels (already at their final root) come back as appends.
    *
    * Endpoint ids are a driver-held model-state fetch (bounded:
    * 2 × batch pairs) reused as the pushed labels filter AND the local
    * lookup relation — the hybrid-index stance; a batch wider than
    * `maxBatchIds` falls back to a distributed lookup join (the one
    * full labels scan such a bulk batch amortizes). */
  def batchAppends(labels: DataFrame, fwd: DataFrame, pairs: DataFrame,
                   maxBatchIds: Int = 1 << 20)
      : (DataFrame, DataFrame) = {
    val spark = pairs.sparkSession
    val endpoints = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val epSchema = endpoints.schema
    val epRows = Materialize.modelState(
      endpoints.limit(maxBatchIds + 1),
      "incremental-components batch endpoints (2 × batch pairs, " +
        "pre-limited to maxBatchIds + 1)", maxBatchIds + 1)
    val (epsDf, known) =
      if (epRows.length > maxBatchIds)
        // documented wide-batch fallback: distributed lookup join
        (endpoints, labels.join(endpoints, Seq("doc_id"), "left_semi"))
      else
        (spark.createDataFrame(
          java.util.Arrays.asList(epRows: _*), epSchema),
          if (epRows.isEmpty) labels.filter(lit(false))
          else labels.filter(org.apache.spark.sql.graft.ColumnBridge
            .inSet("doc_id",
              epRows.map(r => Long.box(r.getLong(0)): Any).toSet)))
    val res = resolveForwards(fwd)
    // current root per endpoint: stored label (own id if new), then
    // through the forwarding closure; pin once — three consumers
    val cur = Materialize.stage(epsDf
      .join(known.select(col("doc_id"), col("comp_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp_id"), col("doc_id")).as("root0"),
        col("comp_id").isNotNull.as("known"))
      .join(res, col("root0") === col("old_root"), "left")
      .select(col("doc_id"),
        coalesce(col("final_root"), col("root0")).as("root"), col("known")))
    // the batch's merge graph lives on ROOTS — batch-bounded; star-CC
    // keeps a chain of B merges to ~log B driver rounds
    val rootPairs = pairs
      .join(cur.select(col("doc_id").as("id_a"), col("root").as("ra")),
        Seq("id_a"))
      .join(cur.select(col("doc_id").as("id_b"), col("root").as("rb")),
        Seq("id_b"))
      .filter(col("ra") =!= col("rb"))
      .select(col("ra").as("id_a"), col("rb").as("id_b"))
    val merged = Materialize.stage(
      graft.text.Dedup.connectedComponentsStar(rootPairs)
        .select(col("id").as("root"), col("comp").as("newRoot")))
    // only roots that exist in STORED state need forwarding: a new
    // node's own-id root is inserted below already at its final root,
    // and no stored row can reference it. Known-endpoint roots are the
    // complete candidate set — a losing root is always some endpoint's
    // resolved root, an unknown endpoint's root is its own UNSEEN id
    // (a seen id would have a label row and classify as known), and a
    // previously-forwarded final root reaching this batch does so as a
    // known endpoint's resolved root.
    val newFwd = merged.filter(col("root") =!= col("newRoot"))
      .join(cur.filter(col("known")).select(col("root")).distinct(),
        Seq("root"), "left_semi")
      .select(col("root").as("old_root"), col("newRoot").as("new_root"))
    val newLabels = cur.filter(!col("known"))
      .join(merged, Seq("root"), "left")
      .select(col("doc_id"),
        coalesce(col("newRoot"), col("root")).as("comp_id"))
    (newLabels, newFwd)
  }

  /** Compaction: the resolved view as the new labels relation plus an
    * EMPTY forwards — callers overwrite/truncate their stage tables
    * with these on their maintenance cadence (the hybrid-index
    * compaction stance), after which reads resolve through zero
    * forwarding hops until the next merge. */
  def compacted(labels: DataFrame, fwd: DataFrame)
      : (DataFrame, DataFrame) =
    (resolvedLabels(labels, fwd), fwd.limit(0))
}
