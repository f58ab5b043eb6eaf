package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for training-data curation: frequent
  * boilerplate phrases, vocabulary coverage, per-document repetition
  * signals (the Gopher-style quality rules) and token-distribution
  * entropy.
  *
  * Everything is declarative explode → hash-aggregate → (broadcast)
  * join: the corpus text is scanned once per statistic family, term
  * relations shuffle on the term (never the document text), and the
  * small derived sets — frequent phrases, the top-V vocabulary — are
  * broadcast back so the per-document pass stays map-side.
  *
  * Determinism stance (what makes these oracle-checkable): every emitted
  * ratio is a SINGLE division of two exact integers (correctly rounded,
  * engine-independent), and the one floating aggregation (entropy's
  * Σ c·ln c) is quantized to integer micro-units per term before
  * summing, so the sum is exact under any partitioning and evaluation
  * order.
  */
object CorpusStats {

  /** Lowercased whitespace tokens, one row per token occurrence —
    * the corpus tokenizer convention shared with [[TfIdf]]. */
  private def tokenRows(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Exact heavy-hitter tokens via the two-pass sketch-then-verify
    * composition — the vocabulary-scale form of "which tokens dominate
    * the corpus" ([[frequentPhrases]]' question, asked where a plain
    * `GROUP BY token` would shuffle a vocabulary-sized relation).
    *
    * Pass 1 runs ONE scan that feeds both a [[HeavyHittersAgg]]
    * Misra–Gries sketch (shuffle: `capacity × partitions` rows,
    * vocabulary-independent) and the total token count. Every token
    * with true frequency > total/(capacity+1) is GUARANTEED to be
    * among the sketch's candidates; pass 2 re-counts ONLY the
    * candidates (broadcast semi-join before the shuffle, so the
    * group-by touches ≤ capacity distinct keys) and filters on the
    * exact count — so the output is exact and deterministic, with the
    * sketch deciding nothing but routing. Same stance as the Bloom
    * pre-screen in [[Dedup.incrementalDedupBloom]]: the sketch routes,
    * precision comes from an exact pass over the survivors.
    *
    * `minFreq` is a fraction of the total token count; callers must
    * keep `minFreq > 1/(capacity+1)` or the guarantee does not cover
    * the bar (enforced here). */
  def heavyTokens(df: DataFrame, idCol: String, textCol: String,
                  capacity: Int = 256,
                  minFreq: Double = 0.01): DataFrame = {
    require(minFreq > 1.0 / (capacity + 1),
      s"minFreq=$minFreq is below the sketch guarantee 1/(capacity+1)=" +
        s"${1.0 / (capacity + 1)} — raise minFreq or capacity")
    val toks = tokenRows(df, idCol, textCol)
    val pass1 = toks.agg(
      call_function("graft_heavyhitters", col("tok"), lit(capacity)).as("hh"),
      count(lit(1)).as("total")).head()
    val total = pass1.getLong(1)
    val candidates = pass1.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val bar = math.ceil(total * minFreq).toLong
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= bar)
      .select(col("tok"), col("cnt"),
        round(col("cnt").cast("double") / total.toDouble, 6).as("freq"))
  }

  /** Count-min sketch frequency estimation (Cormode & Muthukrishnan
    * 2005) with the exact count carried alongside as the error twin —
    * the fixed-memory answer to "how often does this key occur" when
    * the key universe (phrases, URLs, n-grams) is too large to keep: the
    * sketch is `depth × width` counters regardless of corpus or key-set
    * size, and every estimate is GUARANTEED ≥ the true count
    * (a CMS never undercounts; collisions only inflate).
    *
    * Determinism: the d hash rows are salted md5 buckets
    * (`cm<j>:<tok>`), so cell contents — and therefore every estimate —
    * are engine-exact and replayable by the SQL oracle; there is no RNG
    * and no merge-order sensitivity (cells are plain sums).
    *
    * Shape: building the sketch is one explode pass → groupBy(j, b)
    * with map-side partial sums — the shuffle is ≤ depth·width rows per
    * partition, vocabulary-independent (the same scale argument as the
    * Misra–Gries pass above, trading [[heavyTokens]]' top-k identity
    * question for point-frequency queries). The probe set (a
    * deterministic 1/`probeMod` key sample) joins the depth·width-row
    * cell relation broadcast, so serving is map-side too. The
    * exact twin pays one key-set-sized groupBy — the verification
    * cost, not the production path; `overcount = est − exact ≥ 0` is
    * the per-row contract a spec and the oracle both pin. */
  def countMinEstimates(keys: DataFrame, keyCol: String,
                        depth: Int = 4, width: Int = 512,
                        probeMod: Int = 29): DataFrame = {
    val ks = keys.select(col(keyCol).as("__k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      ks.count() // eager fill: the sketch pass and the exact twin
      def bucket(j: Int, k: org.apache.spark.sql.Column) =
        pmod(Dedup.md5Hash60(concat(lit(s"cm$j:"), k)), lit(width.toLong))
      val cells = ks
        .select(posexplode(array((0 until depth).map(j =>
          bucket(j, col("__k"))): _*)).as(Seq("j", "b")))
        .groupBy(col("j"), col("b"))
        .agg(count(lit(1)).as("c"))
      val probes = ks.groupBy(col("__k")).agg(count(lit(1)).as("exact"))
        .filter(pmod(Dedup.md5Hash60(concat(lit("cmprobe:"), col("__k"))),
          lit(probeMod.toLong)) === 0L)
      probes
        .select(col("__k"), col("exact"),
          posexplode(array((0 until depth).map(j =>
            bucket(j, col("__k"))): _*)).as(Seq("j", "b")))
        .join(broadcast(cells), Seq("j", "b"))
        .groupBy(col("__k"), col("exact"))
        .agg(min(col("c")).as("est"))
        .select(col("__k").as(keyCol), col("exact"), col("est"),
          (col("est") - col("exact")).as("overcount"))
    } finally ks.unpersist(false)
  }

  /** 64-bit hashes of the same token stream (empty tokens dropped
    * BEFORE hashing, so an all-whitespace document contributes nothing
    * — same as [[tokenRows]]'s length filter). */
  private def hashedTokens(textCol: String) =
    transform(
      filter(TextFunctions.tokens(lower(col(textCol))),
        t => length(t) > 0),
      t => xxhash64(t))

  /** Per-document unigram log-probability — the language-model quality
    * proxy: score(d) = Σ_tok ln(C(tok)/N) over the document's token
    * occurrences, where C is the corpus count and N the corpus token
    * total. Low (very negative) averages flag rare-token noise;
    * near-zero averages flag degenerate high-frequency repetition.
    *
    * Shape: one NARROW pass computes N (no explode — just a token
    * count per row, broadcast as a scalar), one explode pass gets per-
    * token corpus counts via a window over the token key (no join, no
    * second tokenize — the [[boilerplateRatio]] lesson), then the doc
    * rollup. Each ln term is floored to integer micro-units before the
    * sum, so aggregation is exact under any partitioning and the whole
    * output is engine-recomputable. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.agg(
      sum(size(filter(TextFunctions.tokens(lower(col(textCol))),
        t => length(t) > 0))).cast("double").as("__N"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    tokenRows(df, idCol, textCol)
      .withColumn("__c", count(lit(1)).over(w))
      .crossJoin(broadcast(n))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(floor(lit(1e6) * (log(col("__c")) - log(col("__N"))))
          .cast("long")).as("logprob_micro"))
      .withColumnRenamed("id", idCol)
  }

  /** Word n-gram phrases that occur in at least `minDf` distinct
    * documents — the corpus boilerplate set (headers, license blurbs,
    * navigation chrome). One distinct-per-doc pass then one term-keyed
    * count: cost scales with distinct (doc, phrase), never pairs. */
  def frequentPhrases(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 4, minDf: Long = 20): DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(Dedup.shingles(lower(col(textCol)), n)))
        .as("phrase"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Per-document boilerplate ratio: the fraction of the document's
    * distinct n-grams that belong to the corpus-frequent phrase set.
    *
    * One gram pass, not two: the per-phrase document frequency rides a
    * whole-partition window over the phrase key, so the corpus text is
    * exploded ONCE and the plan is exactly two shuffles (by phrase,
    * then by id). The alternative — aggregate a frequent-phrase set,
    * broadcast it, join a SECOND gram pass — re-evaluates the
    * tokenize+shingle stage per branch and measured 5× slower; keep
    * [[frequentPhrases]] for callers that want the set itself.
    *
    * Phrases travel as 64-bit shingle hashes (the ratio never needs
    * the strings): no per-gram concat allocation, and the phrase
    * shuffle carries 8-byte words instead of text. Counts equal the
    * string semantics modulo a 64-bit collision (vanishing). */
  def boilerplateRatio(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 4, minDf: Long = 20): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      hashedTokens(textCol).as("__th"))
      .select(col("id"), explode(array_distinct(
        Dedup.shingleHashesFromTokenHashes(col("__th"), n))).as("phrase"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phrase"))
    val stats = grams
      .withColumn("__df", count(lit(1)).over(w))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") >= minDf, 1).otherwise(0)).cast("long")
          .as("n_boiler"))
    df.select(col(idCol).as("id"))
      .join(stats, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)).cast("double"), lit(1.0)),
          4).as("boiler_ratio"))
  }

  /** The top-`v` corpus vocabulary by total occurrence count, term
    * string as total tiebreak. An orderBy + limit — Catalyst runs it as
    * TakeOrdered over the term-count aggregate, no global sort. */
  def vocab(df: DataFrame, idCol: String, textCol: String,
            v: Int = 100): DataFrame =
    tokenRows(df, idCol, textCol)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(v)

  /** Per-document out-of-vocabulary rate against the top-`v` corpus
    * vocabulary — the coverage signal that sizes a tokenizer's vocab
    * and flags documents whose token distribution is off-corpus. The
    * vocabulary is v rows — broadcast, map-side probe. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              v: Int = 100): DataFrame = {
    val inVocab = broadcast(
      vocab(df, idCol, textCol, v).select(col("tok")).withColumn("__in", lit(1)))
    val stats = tokenRows(df, idCol, textCol)
      .join(inVocab, Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1).otherwise(0)).cast("long").as("n_oov"))
    df.select(col(idCol).as("id"))
      .join(stats, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(coalesce(col("n_oov"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_tokens"), lit(0L)).cast("double"), lit(1.0)),
          4).as("oov_rate"))
  }

  /** Per-document repetition signals (the Gopher quality-filter family):
    * type-token ratio, the share of the most frequent token, and the
    * share of the most frequent 2-gram. All three are exact integer
    * ratios — no floating aggregation anywhere — so the output is
    * bit-stable under repartitioning and recomputable by any engine.
    *
    * Every output statistic is a function of the document's OWN token
    * stream, so this is a map-only single scan: the native
    * [[graft.functions.RepetitionStatsKernel]] expression reads all
    * five counters off one sorted pass over the per-row token-hash
    * array. No explode, no groupBy, no join — the corpus token
    * explosion never shuffles (the previous declarative shape paid
    * three doc-keyed shuffles for per-row arithmetic). Counting runs
    * on 64-bit token/bigram hashes, never materialized gram strings
    * (counts identical modulo a within-document 64-bit collision,
    * P ≈ tokens²·2⁻⁶⁴, vanishing). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      call_function("graft_repetition", hashedTokens(textCol)).as("__r"))
      .select(col("id").as(idCol),
        col("__r.n_tokens").as("n_tokens"),
        col("__r.n_distinct").as("n_distinct"),
        round(col("__r.n_distinct").cast("double") /
          greatest(col("__r.n_tokens").cast("double"), lit(1.0)),
          4).as("ttr"),
        round(col("__r.max_tok").cast("double") /
          greatest(col("__r.n_tokens").cast("double"), lit(1.0)),
          4).as("top_tok_share"),
        round(col("__r.max_bg").cast("double") /
          greatest(col("__r.n_bigrams").cast("double"), lit(1.0)),
          4).as("top_bigram_share"))

  /** Per-document Shannon entropy of the token distribution (nats),
    * via H = ln N − (Σ c·ln c)/N over per-token counts c.
    *
    * The per-term contribution c·ln c is quantized to integer
    * micro-units (floor(x·1e6)) BEFORE the per-document sum: a plain
    * double sum's value depends on partition/evaluation order, which
    * would make the 4-decimal output flap across runs and engines; the
    * quantized sum is an exact BIGINT under any ordering. The ~1e-6
    * quantization bias is far below the rounding precision. */
  /** Per-document bigram language-model score — the CCNet-style
    * perplexity proxy for quality filtering, with the corpus itself as
    * the model: every document is scored by the average add-one-
    * smoothed conditional log-probability of its bigrams,
    * `avg over (w1,w2) of ln((C(w1,w2)+1) / (C(w1)+V))` — boilerplate
    * and templated text (predictable continuations) scores high,
    * token soup scores low.
    *
    * Scale shape: bigrams build map-side from the token array (bound
    * attribute, O(1) element reads); only (id, w1, w2) relations
    * shuffle — the bigram-count aggregate, the context-count rollup
    * DERIVED from it (no second corpus pass), and the score join keyed
    * on the bigram. The vocabulary size is the one driver scalar
    * (bounded, like a centroid fetch). Determinism: each bigram's log
    * term is quantized to integer micro-units before the per-doc sum
    * (the [[tokenEntropy]] stance), so partial-merge order can never
    * move a result. Documents with < 2 tokens emit (0, 0.0). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramLogProbAgainst(df, df, idCol, textCol)

  /** [[bigramLogProb]] generalized to CROSS-scoring: the LM trains on
    * `train` and scores `score` — the shape importance-resampling
    * needs (a target-domain LM scoring the raw corpus). Unseen
    * bigrams/contexts smooth to (0+1)/(0+V) via left joins, so
    * out-of-target text gets the floor probability instead of
    * vanishing from the sum; with `train eq score` every scored
    * bigram exists in the counts and this reduces exactly to the
    * self-scoring form. V is the TRAIN vocabulary (one bounded driver
    * scalar, like a centroid fetch). */
  def bigramLogProbAgainst(train: DataFrame, score: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    def toks(d: DataFrame) = d.select(col(idCol).as("id"),
      filter(TextFunctions.tokens(lower(col(textCol))),
        t => length(t) > 0).as("t"))
    def bigrams(tl: DataFrame) = tl.filter(size(col("t")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2), i =>
          struct(element_at(col("t"), i + 1).as("w1"),
            element_at(col("t"), i + 2).as("w2")))).as("s"))
      .select(col("id"), col("s.w1").as("w1"), col("s.w2").as("w2"))
    val trainToks = toks(train)
    val cbg = bigrams(trainToks)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbg"))
    val cw1 = cbg.groupBy(col("w1")).agg(sum(col("cbg")).as("cw1"))
    val vocab = trainToks.select(explode(col("t")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    val scored = bigrams(toks(score))
      .join(cbg, Seq("w1", "w2"), "left")
      .join(cw1, Seq("w1"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(log((coalesce(col("cbg"), lit(0L)).cast("double") + 1.0) /
            (coalesce(col("cw1"), lit(0L)).cast("double") + vocab.toDouble))
            * lit(1e6))
          .cast("long")).as("q"))
    score.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(
            (col("q").cast("double") / lit(1e6)) /
              col("n_bigrams").cast("double"), 4)).as("avg_logprob"))
  }

  /** The TERM-LEVEL view [[bigramLogProbAgainst]] aggregates: one row
    * per scored bigram, (id, pos, q) with q the micro-unit-quantized
    * smoothed conditional log-prob of the bigram at position `pos` —
    * exactly the integers whose per-doc sum the aggregate form emits.
    * Exposed for order-statistic scoring (Min-K% Prob membership
    * detection takes the BOTTOM k of these, which no per-doc sum can
    * recover). Same scale shape: only (id, pos, w1, w2) relations
    * shuffle; the count joins are on the bigram key. */
  def bigramTermScores(train: DataFrame, score: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    def toks(d: DataFrame) = d.select(col(idCol).as("id"),
      filter(TextFunctions.tokens(lower(col(textCol))),
        t => length(t) > 0).as("t"))
    def bigrams(tl: DataFrame) = tl.filter(size(col("t")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(0), size(col("t")) - 2), i =>
          struct(element_at(col("t"), i + 1).as("w1"),
            element_at(col("t"), i + 2).as("w2")))).as("s"))
      .select(col("id"), col("s.w1").as("w1"), col("s.w2").as("w2"))
    def bigramsPos(tl: DataFrame) = tl.filter(size(col("t")) >= 2)
      .select(col("id"),
        posexplode(transform(sequence(lit(0), size(col("t")) - 2), i =>
          struct(element_at(col("t"), i + 1).as("w1"),
            element_at(col("t"), i + 2).as("w2"))))
          .as(Seq("pos", "s")))
      .select(col("id"), col("pos"),
        col("s.w1").as("w1"), col("s.w2").as("w2"))
    val trainToks = toks(train)
    val cbg = bigrams(trainToks)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbg"))
    val cw1 = cbg.groupBy(col("w1")).agg(sum(col("cbg")).as("cw1"))
    val vocab = trainToks.select(explode(col("t")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    bigramsPos(toks(score))
      .join(cbg, Seq("w1", "w2"), "left")
      .join(cw1, Seq("w1"), "left")
      .select(col("id"), col("pos"),
        floor(log((coalesce(col("cbg"), lit(0L)).cast("double") + 1.0) /
            (coalesce(col("cw1"), lit(0L)).cast("double") + vocab.toDouble))
          * lit(1e6)).cast("long").as("q"))
  }

  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = tokenRows(df, idCol, textCol)
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("c"))
    val stats = counts.groupBy(col("id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e6)).cast("long")).as("q"))
    df.select(col(idCol).as("id"))
      .join(stats, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(
            log(col("n_tokens").cast("double")) -
              (col("q").cast("double") / lit(1e6)) /
                col("n_tokens").cast("double"),
            4)).as("entropy"))
  }
}
