package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality classifier trained IN the engine — the
  * discriminative filter every large LM corpus pipeline runs (a linear
  * model scoring "does this look like the curated reference set?", cf.
  * the GPT-3/LLaMA/RedPajama quality classifiers; the reference
  * framework's quality gates are rule-based only, e.g.
  * `/root/reference/modules/auto_loader_steps.py` row-validity checks —
  * a learned filter is the beyond-parity step a training-data pipeline
  * needs).
  *
  * Model: multinomial Naive Bayes over HASHED token counts (the
  * fastText hashing trick bounds the feature space): token → md5-60
  * bucket in `[0, buckets)`; per-bucket weight is the Laplace-smoothed
  * log-likelihood ratio
  * `w_j = ln((C₁ⱼ+1)/(T₁+B)) − ln((C₀ⱼ+1)/(T₀+B))`, the bias is the
  * class log-prior `ln(N₁/N₀)`, and a document's margin is
  * `b + Σⱼ cntⱼ·w_j` — the NB log-odds.
  *
  * Why NB and not iterative GD: the closed form trains in ONE
  * distributed pass — at 100 TB that is one map-combined shuffle over
  * (bucket, class) pairs instead of a full corpus scan per gradient
  * round, and there is no convergence/learning-rate surface to tune.
  * (An earlier GD cut of this file needed tens of full-batch rounds to
  * separate what NB separates immediately.)
  *
  * Reproducibility (the [[graft.vector.KMeans]] stance):
  *
  *  - '''Integer margins.''' Weights are floored to integer MICRO-UNITS
  *    once, at model build; a margin is then `bq + Σ cnt·wq` — a sum
  *    of BIGINT products, exact under ANY partitioning, parallelism,
  *    or engine. Ranks and keep-thresholds downstream operate on the
  *    integer margin; the float `sigmoid(mq/1e6)` score is
  *    presentation only.
  *  - '''The model is a relation, not driver state.''' Class-bucket
  *    counts aggregate to ≤ 2·buckets rows; the weight table derives
  *    from them declaratively and joins back broadcast. Nothing is
  *    collected to the driver — training and scoring are ONE Catalyst
  *    plan, so the optimizer sees all of it.
  *  - '''Deterministic hashing.''' Bucket = portable md5-60 % buckets
  *    ([[Dedup.md5Hash60]]) — any engine with md5 replays the feature
  *    map, which is what lets DuckDB re-train the identical model and
  *    match the margins bit for bit.
  *
  * Scale shape: one corpus pass builds (id, y, j, cnt); the model
  * aggregate shuffles ≤ buckets×partitions rows (map-side combine);
  * scoring joins the ≤ buckets-row weight table broadcast. Text never
  * shuffles.
  */
object Classifier {

  /** Per-document hashed bucket counts (id, y, j, cnt) — token
    * OCCURRENCES, not presence (multinomial NB). Token-less documents
    * carry no rows and are outside the model by construction. */
  def bucketCounts(df: DataFrame, idCol: String, textCol: String,
                   label: Column, buckets: Int): DataFrame =
    df.select(col(idCol).as("id"), label.cast("long").as("y"),
      explode(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("tok"))
      .select(col("id"), col("y"),
        (Dedup.md5Hash60(col("tok")) % buckets).as("j"))
      .groupBy(col("id"), col("y"), col("j"))
      .agg(count(lit(1)).as("cnt"))

  /** Train + score in one declarative plan: every feature-bearing
    * document's exact integer NB log-odds margin (id, y, mq),
    * micro-units. Both classes must be non-empty (the log-prior is
    * undefined otherwise — guarded by the smoothed +1 only on bucket
    * counts, deliberately not on class counts). */
  def scored(df: DataFrame, idCol: String, textCol: String, label: Column,
             buckets: Int = 4096): DataFrame = {
    // The count relation feeds four subtrees (class counts, totals,
    // prior, scoring join) whose differing column pruning defeats
    // ReuseExchange — unpersisted, the corpus text is scanned 7×.
    // Cache it EAGERLY (the PERF_NOTES cache-fill-race rule) for the
    // duration of the one consuming job and release it after the
    // result is materialized lineage-free.
    val dc = bucketCounts(df, idCol, textCol, label, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Class-bucket counts → the weight relation (≤ buckets rows).
    val cc = dc.groupBy(col("y"), col("j")).agg(sum(col("cnt")).as("c"))
    val byBucket = cc.groupBy(col("j"))
      .agg(sum(when(col("y") === 1, col("c"))).as("c1"),
        sum(when(col("y") === 0, col("c"))).as("c0"))
    val totals = cc.groupBy()
      .agg(sum(when(col("y") === 1, col("c"))).as("t1"),
        sum(when(col("y") === 0, col("c"))).as("t0"))
    val weights = byBucket.crossJoin(broadcast(totals))
      .select(col("j"),
        floor((log((coalesce(col("c1"), lit(0L)).cast("double") + 1.0) /
            (col("t1").cast("double") + buckets.toDouble)) -
          log((coalesce(col("c0"), lit(0L)).cast("double") + 1.0) /
            (col("t0").cast("double") + buckets.toDouble))) * lit(1e6))
          .cast("long").as("wq"))
    val prior = dc.select(col("id"), col("y")).distinct()
      .groupBy()
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
      .select(floor(log(col("n1").cast("double") / col("n0").cast("double"))
        * lit(1e6)).cast("long").as("bq"))
    try {
      dc.count() // eager fill before the multi-subtree consuming job
      dc.join(broadcast(weights), Seq("j"))
        .groupBy(col("id"), col("y"))
        .agg(sum(col("cnt") * col("wq")).as("sq"),
          sum(col("cnt")).as("n_tok"))
        .crossJoin(broadcast(prior))
        .select(col("id"), col("y"), (col("bq") + col("sq")).as("mq"),
          col("n_tok"))
        .transform(graft.plans.Materialize.stage)
    } finally dc.unpersist(false)
  }

  /** The trained binary model AS A STORABLE RELATION — (j, wq)
    * log-odds weights per observed bucket, the class log-prior at
    * j = −1 (the intercept: scoring attaches one implicit count-1
    * occurrence per document), and the unseen-bucket log-odds floor at
    * j = −2 (the weight formula at C₁ = C₀ = 0 — what the smoothing
    * gives a bucket neither class has seen; [[scored]] never needs it
    * because it scores the training corpus, but a SERVING path scoring
    * new documents does). Bounded at buckets+2 rows and materialized
    * lineage-free: write it to a [[graft.catalog.ParquetTable]] and
    * serve batches or streams against it — the model outlives the
    * session that trained it. */
  def fit(df: DataFrame, idCol: String, textCol: String, label: Column,
          buckets: Int = 4096): DataFrame = {
    val dc = bucketCounts(df, idCol, textCol, label, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      dc.count()
      val cc = dc.groupBy(col("y"), col("j")).agg(sum(col("cnt")).as("c"))
      val byBucket = cc.groupBy(col("j"))
        .agg(sum(when(col("y") === 1, col("c"))).as("c1"),
          sum(when(col("y") === 0, col("c"))).as("c0"))
      val totals = cc.groupBy()
        .agg(sum(when(col("y") === 1, col("c"))).as("t1"),
          sum(when(col("y") === 0, col("c"))).as("t0"))
      val weights = byBucket.crossJoin(broadcast(totals))
        .select(col("j"),
          floor((log((coalesce(col("c1"), lit(0L)).cast("double") + 1.0) /
              (col("t1").cast("double") + buckets.toDouble)) -
            log((coalesce(col("c0"), lit(0L)).cast("double") + 1.0) /
              (col("t0").cast("double") + buckets.toDouble))) * lit(1e6))
            .cast("long").as("wq"))
      val prior = dc.select(col("id"), col("y")).distinct()
        .groupBy()
        .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
        .select(lit(-1L).as("j"),
          floor(log(col("n1").cast("double") / col("n0").cast("double"))
            * lit(1e6)).cast("long").as("wq"))
      val floorRow = totals.select(lit(-2L).as("j"),
        floor((log(lit(1.0) / (col("t1").cast("double") + buckets.toDouble)) -
          log(lit(1.0) / (col("t0").cast("double") + buckets.toDouble)))
          * lit(1e6)).cast("long").as("wq"))
      weights.unionByName(prior).unionByName(floorRow).transform(graft.plans.Materialize.stage)
    } finally dc.unpersist(false)
  }

  /** Score documents against a TRAINED model relation (the [[fit]]
    * output, typically read back from its stage table): one narrow
    * text pass, a broadcast join against the ≤ buckets+2-row model,
    * one per-doc reduce — margins stay exact BIGINTs, unseen buckets
    * fall back to the model's j = −2 floor weight. This is the serving
    * path: per arriving batch (or micro-batch) nothing shuffles but
    * (id, j, cnt) rows. */
  def scoreWith(df: DataFrame, idCol: String, textCol: String,
                model: DataFrame, buckets: Int = 4096): DataFrame = {
    val dc = bucketCounts(df, idCol, textCol, lit(0L), buckets)
      .select(col("id"), col("j"), col("cnt"))
    // The intercept (one implicit count-1 occurrence of the j = −1
    // model row per document) is attached AFTER the per-doc reduce as
    // `bq + Σ cnt·w` — algebraically identical to the earlier unioned
    // intercept row, but the arriving batch's token relation is scanned
    // ONCE (the union + distinct form tokenized and hashed every
    // micro-batch twice, against the repo's multi-consumer pin rule —
    // and a serving-path relation can't be persist-scoped because the
    // result must stay lazy for foreachBatch callers).
    val floorRow = model.filter(col("j") === -2L).select(col("wq").as("fq"))
    val interceptRow = model.filter(col("j") === -1L).select(col("wq").as("bq"))
    dc
      .join(broadcast(model.filter(col("j") >= 0L)), Seq("j"), "left")
      .crossJoin(broadcast(floorRow))
      .groupBy(col("id"))
      .agg(sum(col("cnt") * coalesce(col("wq"), col("fq"))).as("sq"),
        sum(col("cnt")).as("n_tok"))
      .crossJoin(broadcast(interceptRow))
      .select(col("id"), (col("bq") + col("sq")).as("mq"), col("n_tok"))
  }

  /** Length-normalized margin — NB log-odds grow with document length
    * (Σ cnt·w), so raw margins rank long documents by length, not
    * likeness; the per-token average is the comparable quantity.
    * Exact-int over exact-int division is correctly rounded, hence
    * engine-deterministic. */
  def avgMargin: Column =
    col("mq").cast("double") / col("n_tok").cast("double")

  /** Histogram ROC-AUC estimator — the 100 TB form of
    * [[graft.queries.CorpusQueries]]'s exact Mann–Whitney entry, which
    * ranks the whole corpus through one ordering task. Margins
    * quantize to fixed `1/resolution` buckets via
    * `floor(mq·resolution / n_tok)` (a DOUBLE floor — IEEE evaluates
    * it identically in any engine, so the estimate is DETERMINISTIC
    * and oracle-replayable, unlike a sketch threshold); AUC reads off
    * the bucket counts with in-bucket pairs as ties (midrank
    * convention): `A2 = Σ_b n1_b·(2·cumN0_below + n0_b)`,
    * `AUC = A2/(2·n1·n0)` — all-integer until the final division.
    * Estimator error vs the exact rank is bounded by the probability
    * mass of cross-class in-bucket ties (ClassifierSpec pins it).
    * The one window runs over the BUCKET relation — bounded by margin
    * range × resolution, a corpus-independent constant. Input:
    * a (y, mq, n_tok) relation ([[scored]]'s shape). */
  def histAuc(scored: DataFrame, resolution: Double = 10000.0): DataFrame = {
    val hist = scored
      .select(col("y"),
        floor(col("mq").cast("double") * lit(resolution) /
          col("n_tok").cast("double")).cast("long").as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist
      .withColumn("cum0", coalesce(sum(col("n0")).over(w), lit(0L)))
      .agg(sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
        sum(col("n1") * (lit(2L) * col("cum0") + col("n0"))).as("a2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("a2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 4).as("auc"))
  }

  /** MULTICLASS multinomial NB — the language-ID / source-ID shape:
    * train per-class log-likelihood weights on `train`, score every
    * `test` document against every trained class, and emit the argmax
    * prediction per document (ties — impossible in practice on exact
    * integer margins — break to the first class name).
    *
    * Same reproducibility contract as the binary form: weights, priors
    * and the per-class unseen-bucket floor ln(α/(T_c+αB)) are floored
    * to micro-units ONCE; a margin is `prior_c + Σ cnt·w_cj` — a
    * BIGINT sum. Unseen buckets matter here (a test doc scored against
    * a class that never saw its tokens): the weight join is LEFT and
    * falls back to the class's floor weight, exactly what the
    * smoothing prescribes for C = 0.
    *
    * Smoothing is LIDSTONE (α = 0.01), not Laplace add-one: with B
    * comparable to a class's token total T_c, add-one turns every
    * SHARED token into evidence for the largest class — the estimate
    * (C+1)/(T_c+B) deflates small-class likelihoods by ≈ (T_big+B)/
    * (T_small+B) per token, which summed over a document swamps any
    * real signal (measured on the lang fixture: the +1 model collapsed
    * to the majority class; α = 0.01 recovers the diagonal). Class
    * imbalance is the NORMAL condition for this data, so the small-α
    * default is the safe one.
    *
    * Scale shape: training is one map-combined shuffle to a
    * (class, bucket) relation (≤ classes·buckets rows, broadcast back);
    * scoring expands each test doc's bucket rows by the class count
    * (bounded — classes is a dimension, not data) and reduces per
    * (doc, class) then per doc. Nothing corpus-sized reaches the
    * driver and text never shuffles. */
  def multiclassPredictions(train: DataFrame, test: DataFrame,
                            idCol: String, textCol: String, classCol: String,
                            buckets: Int = 4096,
                            alpha: Double = 0.01): DataFrame = {
    val occ = (d: DataFrame) => d.select(col(idCol).as("id"),
      col(classCol).as("cls"),
      explode(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("tok"))
      .select(col("id"), col("cls"),
        (Dedup.md5Hash60(col("tok")) % buckets).as("j"))
    // cc is ≤ classes·buckets rows but its lineage is the full train
    // text pass; tc and the weight join both consume it, so pin it
    // lineage-free (one corpus pass, the [[scored]] stance).
    val cc = occ(train).groupBy(col("cls"), col("j"))
      .agg(count(lit(1)).as("c"))
      .transform(graft.plans.Materialize.stage)
    val tc = cc.groupBy(col("cls")).agg(sum(col("c")).as("t"))
    val nDocs = train.select(col(idCol), col(classCol)).distinct()
      .groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("n"))
    val nTotal = train.select(countDistinct(col(idCol)).as("n_total"))
    val classStats = tc.join(nDocs, Seq("cls"))
      .crossJoin(broadcast(nTotal))
      .select(col("cls"),
        floor(log(col("n").cast("double") / col("n_total").cast("double"))
          * lit(1e6)).cast("long").as("pq"),
        floor(log(lit(alpha) /
            (col("t").cast("double") + lit(alpha) * buckets.toDouble))
          * lit(1e6)).cast("long").as("floorq"),
        col("t"))
    val weights = cc.join(classStats.select(col("cls"), col("t")), Seq("cls"))
      .select(col("cls"), col("j"),
        floor(log((col("c").cast("double") + lit(alpha)) /
            (col("t").cast("double") + lit(alpha) * buckets.toDouble))
          * lit(1e6)).cast("long").as("wq"))
    val dcTest = occ(test).groupBy(col("id"), col("cls"), col("j"))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed("cls", "truth")
    val margins = dcTest
      .crossJoin(broadcast(classStats.select(col("cls"), col("pq"), col("floorq"))))
      .join(broadcast(weights), Seq("cls", "j"), "left")
      .groupBy(col("id"), col("truth"), col("cls"), col("pq"))
      .agg(sum(col("cnt") * coalesce(col("wq"), col("floorq"))).as("sq"))
      .select(col("id"), col("truth"), col("cls"),
        (col("pq") + col("sq")).as("mq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("mq").desc, col("cls"))
    margins.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("truth"), col("cls").as("pred"))
  }
}
