package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity pass a retrieval stage runs AFTER candidate
  * generation: greedily pick the item maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` so the final k are
  * relevant but not near-duplicates of each other (RAG context slots,
  * dedup-aware few-shot selection).
  *
  * The greedy recurrence is inherently sequential in k, so the loop
  * unrolls over DATAFRAME rounds, never rows: each round is a
  * max-sim aggregate + an argmax over the per-query CANDIDATE relation
  * (k-bounded — candidates per query, not the corpus; the corpus-sized
  * work already happened in candidate generation). Every round's
  * selection is staged ([[graft.plans.Materialize]]) because round r+1
  * consumes it from two subtrees (the anti-join and the max-sim side) —
  * the repo's multi-consumer pin rule — and because the union lineage
  * would otherwise deepen by three joins per round.
  *
  * Determinism: scores combine cosine doubles with λ and 1−λ literals.
  * Callers should pick λ whose complement is exact in binary (0.5,
  * 0.25, 0.75) so `1−λ` is the same double on every engine — with an
  * inexact λ the Scala-computed complement (e.g. 1−0.7 =
  * 0.30000000000000004) and an engine's parsed literal 0.3 would
  * differ in the last ulp and flip near-tie argmax picks. Ties break to
  * the lowest id via struct ordering, mirroring a `row_number() OVER
  * (ORDER BY score DESC, id)` replay exactly. */
object Mmr {

  /** @param cands (qidCol, idCol, rel) — per-query candidate relevance
    * @param pairs (qidCol, a, b, sim) — pairwise similarity between
    *              candidates of the same query; either orientation (or
    *              both) per pair — symmetrized internally, because the
    *              max-sim join only matches `b` against selected ids
    *              and a one-sided input would silently under-penalize
    *              near-duplicates instead of failing
    * @return (qidCol, idCol, score, rank) — the k MMR picks per query */
  def rerank(cands: DataFrame, pairs: DataFrame, qidCol: String,
             idCol: String, k: Int, lam: Double = 0.5): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // union of both orientations; no distinct needed — the consumer is
    // a max() aggregate, which duplicate rows cannot perturb
    val sym = pairs.select(col(qidCol), col("a"), col("b"), col("sim"))
      .unionByName(pairs.select(col(qidCol), col("b").as("a"),
        col("a").as("b"), col("sim")))
    def argmax(scored: DataFrame, r: Int): DataFrame = scored
      .groupBy(col(qidCol))
      .agg(min(struct((-col("score")).as("ns"), col(idCol).as("id"),
        col("score").as("s"))).as("p"))
      .select(col(qidCol), col("p.id").as(idCol), col("p.s").as("score"),
        lit(r).as("rank"))
    // round 1: max over the empty selected set is 0 — score is λ·rel
    var all = graft.plans.Materialize.stage(argmax(
      cands.select(col(qidCol), col(idCol),
        (lit(lam) * col("rel")).as("score")), 1))
    for (r <- 2 to k) {
      val ms = sym
        .join(all.select(col(qidCol), col(idCol).as("b")), Seq(qidCol, "b"))
        .groupBy(col(qidCol), col("a"))
        .agg(max(col("sim")).as("ms"))
        .withColumnRenamed("a", idCol)
      val scored = cands
        .join(all.select(col(qidCol), col(idCol)), Seq(qidCol, idCol),
          "left_anti")
        .join(ms, Seq(qidCol, idCol), "left")
        .select(col(qidCol), col(idCol),
          (lit(lam) * col("rel")
            - lit(1.0 - lam) * coalesce(col("ms"), lit(0.0))).as("score"))
      all = graft.plans.Materialize.stage(all.unionByName(argmax(scored, r)))
    }
    all
  }
}
