package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drift monitor for a stored IVF/IVF-PQ index under insert-only
  * maintenance — the day-2 gap `q_ann_index_insert` left open:
  * arriving vectors are assigned to STORED centroids forever, so under
  * distribution drift cell occupancy skews and assignment quality
  * decays silently. The monitor closes the loop with two signals
  * computed from the INDEX's own relations (never a corpus pass) and a
  * deterministic per-cell retrain decision (the
  * [[graft.orchestrate.RunDecision]] stance: the decision is a column
  * of a relation, reproducible by any engine, not an operator's
  * eyeball):
  *
  *  - **assignment quality**: each row's similarity to its assigned
  *    centroid is quantized and STORED AT ASSIGN TIME
  *    ([[assignScored]] — one extra long beside the (id, cid) the
  *    index stores anyway), so the monitor reads bytes that already
  *    exist. A generation whose mean assignment similarity falls
  *    `simDropMicro` below the training generation's is drifting away
  *    from every stored centroid.
  *  - **occupancy skew**: each generation's share of every cell. A
  *    distribution shift shows up as share mass moving between cells
  *    even when per-row similarity is still acceptable.
  *
  * Baseline choice: the 'train' generation must be a HELD-OUT
  * reference window (e.g. the first served insert window), NEVER the
  * population the centroids were trained on — a training member's
  * coordinates contributed to its own centroid, inflating its
  * assignment similarity by ~1/√m for an m-member cell (measured
  * +0.13..0.20 cosine at m≈15), so a training-population baseline
  * reads healthy inserts as drift.
  *
  * Scale shape: the monitor aggregates the assignment relation by
  * (cell, generation) — one shuffle of (cid, simq, gen) triples into a
  * k × generations relation, then k-bounded joins. Nothing reads
  * vectors; nothing is corpus-sized past the first hash aggregate.
  *
  * Determinism: simq = floor(dot·10⁶ / √(‖q‖²·‖c‖²)) over ×1000-
  * quantized coordinates — integer dot products exact in both engines,
  * the one double rounding identical under IEEE (the bitext cos_q
  * contract), so means/shares/decisions hash-compare across engines. */
object IndexHealth {

  /** Nearest-stored-centroid assignment CARRYING the quantized
    * assignment similarity: (idCol, cid, simq). Cell choice is
    * [[Ann.ivfAssign]]'s (float-cosine argmax, ties to the smaller
    * cid); simq is the engine-exact quantized cosine of the row
    * against its assigned centroid. Map-side except the model-sized
    * centroid-relation join; zero-norm rows are absent (no direction,
    * never a candidate). Centroid coordinates are expected in the
    * ×1000-quantized integer scale [[KMeans.fitCentroids]] produces —
    * cosine is scale-invariant so serving is unaffected, and the
    * integral coords are what make simq exact. */
  def assignScored(vecs: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame): DataFrame = {
    val assigned = Ann.ivfAssign(vecs, idCol, vecCol, centroids)
    val qcents = centroids.select(col("cid"),
      transform(col(vecCol).cast("array<double>"),
        x => x.cast("long")).as("__cv"))
    assigned
      .join(vecs.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qcents), Seq("cid"))
      .withColumn("__qv", transform(col(vecCol).cast("array<double>"),
        x => floor(x * lit(1000.0)).cast("long")))
      .withColumn("__dot", aggregate(
        zip_with(col("__qv"), col("__cv"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__nq", aggregate(col("__qv"), lit(0L),
        (acc, x) => acc + x * x))
      .withColumn("__nc", aggregate(col("__cv"), lit(0L),
        (acc, x) => acc + x * x))
      .select(col(idCol), col("cid"),
        floor(col("__dot").cast("double") * lit(1000000.0) /
          sqrt((col("__nq") * col("__nc")).cast("double")))
          .cast("long").as("simq"))
  }

  /** Per-cell health of a scored assignment relation carrying a
    * generation tag — (cid, simq, gen) with gen ∈ {'train', 'new'} —
    * and the retrain decision: a cell is `drifted` when the new
    * generation's mean assignment similarity fell more than
    * `simDropMicro` below the training generation's IN THAT CELL, or
    * when the cell's occupancy share moved more than `occShiftMicro`
    * between generations. Means and shares are floor(double-div) —
    * identical floor-division semantics in both engines even for
    * negative sums (Spark's integral `div` truncates toward zero and
    * would disagree below zero).
    *
    * `minCellN` gates the per-cell decision on EVIDENCE: a cell must
    * carry at least that many rows in BOTH generations to flag — a
    * 2-member cell's mean similarity is sample noise, not a quantizer
    * signal, and production monitors act only where they have support
    * (the AnnSpec forward-monitor proof uses this; the sub-threshold
    * columns still report, so an operator can see starved cells). The
    * default 0 keeps every cell eligible — the configuration the
    * `q_ann_index_health` oracle replays. */
  def cellHealth(assign: DataFrame,
                 simDropMicro: Long = 100000L,
                 occShiftMicro: Long = 100000L,
                 minCellN: Long = 0L): DataFrame =
    cellHealthFromStats(scoredStats(assign),
      simDropMicro, occShiftMicro, minCellN)

  /** Per-(cell, generation) SUFFICIENT STATISTICS of a scored
    * assignment relation — (cid, gen, n, ssimq). Everything
    * [[cellHealth]] decides from derives from these two exact
    * integers, and they are ADDITIVE and order-independent: a
    * streaming monitor maintains them with an incremental `tgt + src`
    * MERGE (the [[graft.streaming.UpsertSink]] exactly-once additive
    * pattern — `q_stream_ann_maintain` does exactly this) instead of
    * re-aggregating its whole scored history every batch, so per-batch
    * monitor cost is k × generations ROWS at any history length, and a
    * redelivered batch can never double-count a cell. */
  def scoredStats(scored: DataFrame): DataFrame =
    scored.groupBy(col("cid"), col("gen"))
      .agg(count(lit(1)).as("n"), sum(col("simq")).as("ssimq"))

  /** [[cellHealth]] from a pre-aggregated [[scoredStats]] relation —
    * the streaming monitor's entry point (its stats table IS this
    * relation, maintained additively). */
  def cellHealthFromStats(cg: DataFrame,
                          simDropMicro: Long = 100000L,
                          occShiftMicro: Long = 100000L,
                          minCellN: Long = 0L): DataFrame = {
    // per-generation totals: a generations-sized aggregate (2 rows) —
    // broadcast is structurally bounded, not a corpus fact
    val tots = cg.groupBy(col("gen")).agg(sum(col("n")).as("tot"))
    val st = cg.join(broadcast(tots), Seq("gen"))
      .select(col("cid"), col("gen"), col("n"),
        floor(col("ssimq").cast("double") / col("n"))
          .cast("long").as("mean_simq"),
        floor((col("n") * lit(1000000L)).cast("double") / col("tot"))
          .cast("long").as("share_micro"))
    def gen(g: String, suffix: String) = st.filter(col("gen") === g)
      .select(col("cid"), col("n").as(s"n_$suffix"),
        col("mean_simq").as(s"mean_simq_$suffix"),
        col("share_micro").as(s"share_${suffix}_micro"))
    gen("train", "train").join(gen("new", "new"), Seq("cid"), "full_outer")
      .select(col("cid"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        col("mean_simq_train"), col("mean_simq_new"),
        coalesce(col("share_train_micro"), lit(0L)).as("share_train_micro"),
        coalesce(col("share_new_micro"), lit(0L)).as("share_new_micro"))
      .withColumn("sim_drop_micro",
        coalesce(col("mean_simq_train") - col("mean_simq_new"), lit(0L)))
      .withColumn("occ_shift_micro",
        abs(col("share_new_micro") - col("share_train_micro")))
      .withColumn("drifted",
        (col("sim_drop_micro") > simDropMicro ||
          col("occ_shift_micro") > occShiftMicro) &&
          col("n_train") >= minCellN && col("n_new") >= minCellN)
  }
}
