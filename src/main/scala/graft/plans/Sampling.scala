package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified sampling — per-stratum keep rates for class rebalancing
  * (downsample the dominant language/source before training). Same
  * design stance as [[Splits]]: the keep decision is a salted hash of
  * the row KEY against a per-stratum threshold, so the sample is
  * deterministic, stable under repartitioning and corpus growth,
  * point-wise answerable, and recomputable by any engine — none of
  * which holds for `DataFrame.sampleBy`'s RNG. Purely map-side: no
  * shuffle, no sampling pass, and the filter sits directly above the
  * scan where Catalyst can push compatible predicates down.
  */
object Sampling {

  /** Keep each row with its stratum's rate (default `defaultRate` for
    * strata not listed). Rates are a small literal when-chain, not a
    * join — strata sets are enum-sized by construction. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Seq[(String, Double)], defaultRate: Double,
                 seed: String, buckets: Int = 10000): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val cut = rates
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (stratum, r)) =>
        acc.when(col(strataCol) === stratum, lit(math.round(r * buckets)))
      }
      .otherwise(lit(math.round(defaultRate * buckets)))
    // a NULL key would null-propagate through the hash and silently
    // fail the filter even at rate 1.0 — give null keys a sentinel
    // bucket instead (they share it, so a stratum's null rows are kept
    // or dropped together; deterministic either way)
    val key = coalesce(col(keyCol).cast("string"), lit("\u0000null-key"))
    df.filter(Splits.bucketOf(key, seed, buckets) < cut)
  }

  /** Token-budget sampling — "take documents until the budget is
    * full", per stratum: rows are ordered by a salted hash of the key
    * (a deterministic, engine-recomputable shuffle — same stance as
    * [[stratified]]), a running token total accumulates per stratum,
    * and rows are kept while the PRIOR total is under `budget` (so the
    * document that crosses the line is still taken and every stratum
    * reaches its budget rather than stalling under it). This is how a
    * training run sizes a corpus to "N tokens per language" —
    * reproducibly, not by `limit()` on an arbitrary partitioning.
    *
    * One shuffle, keyed by the stratum (the window partition); the
    * token weight is expected to be a map-side expression (e.g.
    * `subwordStats(text).n_subwords`). Emits `cum_tokens` — the
    * running total INCLUDING the row — for budget accounting. */
  def tokenBudget(df: DataFrame, keyCol: String, strataCol: String,
                  weight: org.apache.spark.sql.Column, budget: Long,
                  seed: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(Splits.bucketOf(col(keyCol).cast("string"), seed), col(keyCol))
    df.withColumn("__w", weight)
      .withColumn("cum_tokens", sum(col("__w")).over(w))
      .filter(col("cum_tokens") - col("__w") < budget)
      .drop("__w")
  }

  /** Temperature-scaled mixture rebalancing — the multilingual-corpus
    * sampling rule (`p_s ∝ n_s^τ`, τ ∈ [0,1]): at τ=1 the natural
    * distribution is kept; as τ→0 every stratum is downsampled toward
    * the size of the SMALLEST one. Sampling can only remove rows, so
    * rates are normalized to keep the smallest stratum whole:
    * `rate_s = (n_min / n_s)^(1−τ)`.
    *
    * Unlike [[stratified]], the rates are DERIVED from the data, so one
    * tiny aggregation runs first: per-stratum counts (map-side
    * combined, enum-sized result) joined against the global min. That
    * rate table is broadcast back and the keep decision is the same
    * salted-hash threshold as everywhere else — the corpus itself never
    * shuffles, and the sample is deterministic, stable under
    * repartitioning, and recomputable by any engine. The per-stratum
    * cut is floored onto the bucket grid so the float `pow` never
    * decides a row's fate by less than a full bucket.
    *
    * The input is consumed TWICE (the counts aggregation and the keep
    * filter). Fine over a table scan; when `df` is an expensive
    * derivation (a cleaned/scored pipeline stage), persist it first or
    * the derivation re-evaluates per branch.
    *
    * Rows with a NULL stratum are DROPPED (the rate join is an inner
    * equi join, and a null stratum has no meaningful rate); map nulls
    * to a sentinel stratum first if they must survive. */
  def temperatureMixture(df: DataFrame, keyCol: String, strataCol: String,
                         temperature: Double, seed: String,
                         buckets: Int = 10000): DataFrame = {
    require(temperature >= 0 && temperature <= 1,
      s"temperature $temperature outside [0, 1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    // global min via an unpartitioned window over the ENUM-SIZED counts
    // frame — the counts agg is evaluated once (a separate agg+join
    // would duplicate it into two shuffles of the corpus)
    val minN = min(col("__n")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val rates = counts
      .select(col(strataCol), floor(lit(buckets) *
        pow(minN.cast("double") / col("__n"),
          lit(1.0 - temperature))).as("__cut"))
    // same null-key sentinel as stratified(); cut = buckets (rate 1.0)
    // keeps every row since bucketOf < buckets by construction
    val key = coalesce(col(keyCol).cast("string"), lit("\u0000null-key"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(Splits.bucketOf(key, seed, buckets) < col("__cut"))
      .drop("__cut")
  }

  /** Deterministic weighted sampling WITHOUT replacement, k per
    * stratum — Efraimidis–Spirakis A-ES, the quality-weighted
    * data-selection pass a curation pipeline runs ("keep the 10k best
    * docs per language, preferring high quality but giving every doc a
    * weight-proportional chance"). Each row draws
    * u = md5-60(payload ⊕ seed) ∈ (0, 1) and ranks by u^(1/w); the
    * stratum's top k are the sample — provably equivalent to
    * sequential weighted draws without replacement. The same design
    * stance as [[stratified]]: u is a salted hash of the KEY, so the
    * sample is deterministic, stable under repartitioning, and
    * replayable by any engine with md5.
    *
    * Implementation: rank by ln(u)/w — the same order as u^(1/w)
    * (monotone transform; both sides negative-log safe since
    * u ∈ (0,1), w > 0) — quantized to integer micro-units so the
    * ordering is engine-exact (the bigram-LM precedent), and fed to
    * the native `graft_topk` aggregate: map-side partials cut every
    * stratum to ≤ k rows BEFORE the shuffle — no Window, no
    * per-stratum sort, shuffle volume k·partitions per stratum
    * regardless of corpus size. Weights must be strictly positive.
    * Output: (stratum, rk, payload, sample_key), rk 1..k by
    * descending key with payload-ascending tie-break. */
  def weightedSample(df: DataFrame, strataCol: String, weightCol: String,
                     payloadCol: String, k: Int, seed: String): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val h = conv(substring(
      md5(concat(col(payloadCol).cast("string"), lit(seed))), 1, 15), 16, 10)
      .cast("long")
    // +0.5 keeps u strictly inside (0, 1): h = 0 would send ln to -inf
    val u = (h.cast("double") + lit(0.5)) / lit(1.152921504606846976e18)
    val key = floor(lit(1e6) * log(u) / col(weightCol)).cast("long")
    df.select(col(strataCol), key.as("__k"), col(payloadCol))
      .groupBy(col(strataCol))
      .agg(call_function("graft_topk", col("__k"), col(payloadCol), lit(k))
        .as("top"))
      .select(col(strataCol), posexplode(col("top")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.payload").as(payloadCol), col("col.score").as("sample_key"))
  }

  /** Occurrence cap per stratum — the per-domain/per-source document
    * cap a web-scale pipeline applies so no single origin dominates the
    * training mix (the Common-Crawl URL-cap rule). Every row is kept in
    * the output with its rank and a 0/1 `kept` flag (rank ≤ cap in
    * `orderCol` order — deterministic, so re-runs keep the same rows);
    * callers filter on `kept`.
    *
    * One shuffle on the stratum key. Rows of a stratum land on one
    * partition — at web scale a mega-domain is the skew case, and the
    * right first move is cheaper than salting the window: pre-aggregate
    * per-stratum counts (map-side combine), broadcast the (tiny) set of
    * strata over the cap, and run the window ONLY on rows of those
    * strata — everything else is kept with no rank needed. That
    * rewrite changes the rank column's meaning, so it lives with the
    * caller; the operator itself keeps the exact global-order
    * semantics. */
  def capPerStratum(df: DataFrame, strataCol: String, orderCol: String,
                    cap: Int): DataFrame = {
    require(cap >= 1, "cap must be at least 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(orderCol))
    df.withColumn("rk", row_number().over(w).cast("int"))
      .withColumn("kept", when(col("rk") <= cap, 1).otherwise(0))
  }
}
