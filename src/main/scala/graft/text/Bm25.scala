package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring — rank the corpus against a query term set
  * (Robertson/Okapi with the Lucene `+1` idf smoothing). The retrieval
  * half of a training-data pipeline: decontamination probes, seed-set
  * expansion, and quality triage all reduce to "score 100 TB of
  * documents against a handful of terms and keep the top-k".
  *
  * Shape, chosen for the 100 TB scan:
  *  - Per-document term frequencies come from map-side array HOFs over
  *    the tokenized text (`size(filter(tokens, = term))` per query
  *    term) — the corpus is never exploded and never shuffles on
  *    terms. A query has a handful of terms; columns beat a token
  *    relation by orders of magnitude here.
  *  - Corpus statistics (N, avgdl, per-term document frequencies) are
  *    ONE map-side-partial aggregate producing a single row, broadcast
  *    back into the scoring pass — the classic build-the-index-stats
  *    step, kept as a cheap separate pass (production IR systems cache
  *    it across queries; recomputing it is two narrow scans, never a
  *    wide shuffle).
  *  - Top-k is orderBy+limit → TakeOrderedAndProject: per-partition
  *    heaps, no global sort.
  *
  * Scores are rounded to 4 decimals BEFORE the final ordering so the
  * ranking is a pure function of emitted values (deterministic across
  * engines — libm `ln` ulps vanish in the rounding), doc id as total
  * tiebreak.
  */
object Bm25 {

  /** Top-`k` documents by BM25 score against `queryTerms`.
    * Emits (idCol, score). */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k: Int = 20,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.forall(_.nonEmpty))
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val tfCols = queryTerms.indices.map { i =>
      size(filter(toks, x => x === lit(queryTerms(i)))).cast("long").as(s"tf_$i")
    }
    // one narrow projection both passes share: (id, dl, tf_0..tf_q)
    val base = docs.select(
      (col(idCol) +: size(toks).cast("long").as("dl") +: tfCols): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (avg(col("dl")).as("avgdl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))): _*)
    val perTerm: Seq[Column] = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i")
      val dfq = col(s"df_$i")
      val idf = log((col("n_docs") - dfq + 0.5) / (dfq + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), round(perTerm.reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The INVERTED-INDEX relations for build-once/serve-many retrieval
    * — what [[topDocs]]'s per-query corpus scan becomes at 100 TB:
    * postings (tok, id, tf), document lengths (id, dl) and the one-row
    * corpus stats (n_docs, avgdl), each landed in a stage table by the
    * caller. The postings build is the one corpus-wide pass (explode +
    * groupBy); at scale the table is written sorted by `tok` so a
    * term-filtered serve scan prunes row groups via the pushed IN
    * filter. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("__t"))
    val doclen = toks.select(col(idCol), size(col("__t")).cast("long").as("dl"))
    val postings = toks
      .select(col(idCol), explode(col("__t")).as("tok"))
      .groupBy(col("tok"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .select(col("tok"), col(idCol), col("tf"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    (postings, doclen, stats)
  }

  /** Top-`k` served from the STORED index: the postings scan is
    * filtered to the query terms (an IN filter pushed to the parquet
    * footers — only matching postings are read, the corpus never is),
    * per-term document frequencies fall out of the SAME filtered
    * relation (df_i = matching-posting count, identical to the stats
    * pass's), tfs pivot to one column per term, and the scoring
    * expression is [[topDocs]]'s VERBATIM left-to-right composition —
    * so the two serve paths produce bit-identical doubles before the
    * 4-decimal rounding and one oracle gates both. When fewer than k
    * documents match any term, the result is padded with 0.0-score
    * documents in id order — exactly [[topDocs]]'s ranking of
    * non-matching documents — so the two paths stay row-identical even
    * in the degenerate under-k case (spec-pinned). */
  def topDocsIndexed(postings: DataFrame, doclen: DataFrame,
                     stats: DataFrame, idCol: String,
                     queryTerms: Seq[String], k: Int = 20,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.forall(_.nonEmpty))
    // matching postings feed the df aggregate AND the tf pivot — pin
    // once; the relation is query-sized (terms × matching docs)
    val p = graft.plans.Materialize.stage(
      postings.filter(col("tok").isin(queryTerms: _*)))
    val dfAggs = queryTerms.indices.map(i =>
      sum(when(col("tok") === queryTerms(i), 1L).otherwise(0L)).as(s"df_$i"))
    val dfRow = p.agg(dfAggs.head, dfAggs.tail: _*)
    val tfAggs = queryTerms.indices.map(i =>
      sum(when(col("tok") === queryTerms(i), col("tf")).otherwise(0L))
        .cast("long").as(s"tf_$i"))
    val tfs = p.groupBy(col(idCol)).agg(tfAggs.head, tfAggs.tail: _*)
    val perTerm: Seq[Column] = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i")
      val dfq = col(s"df_$i")
      val idf = log((col("n_docs") - dfq + 0.5) / (dfq + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    }
    val matchedTop = tfs.join(doclen, Seq(idCol))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfRow))
      .select(col(idCol), round(perTerm.reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    // [[topDocs]] ranks NON-matching documents too (score 0.0, then by
    // id) — an unmatched doc can reach the top-k in two degenerate
    // cases: (a) fewer than k documents match any term, and (b) the
    // k-th MATCHED score ROUNDS to 0.0000 (a near-ubiquitous term:
    // idf ≈ (unmatched + 0.5)/df), where topDocs breaks the 0.0 tie by
    // id across matched and unmatched alike. Either way, bring in the
    // k lowest-id unmatched docs (no other unmatched doc can reach the
    // top-k: they all tie at 0.0 and break by id) and re-rank the
    // union, so the two serve paths stay row-identical. The matched
    // count and the min-of-top-k probe are two cheap jobs over the
    // staged match relation; the pad branch — the only doclen-wide
    // rank — runs solely in these degenerate cases.
    val nMatched = p.select(col(idCol)).distinct().count()
    // probe the k-th rounded score ONLY when the match count alone
    // cannot decide the branch — under-k serves skip the rank job
    def minTopRounded: Double = graft.plans.Materialize.modelState(
      matchedTop.agg(min(col("score")).as("m")),
      "bm25 matched top-k min rounded score (1 row)", 1).head.getDouble(0)
    if (nMatched >= k && minTopRounded > 0.0) matchedTop
    else {
      val pad = doclen.select(col(idCol))
        .join(p.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        .orderBy(col(idCol))
        .limit(k)
        .select(col(idCol), lit(0.0).as("score"))
      matchedTop.unionByName(pad)
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }
  }

  /** BATCHED retrieval from the stored index: top-`k` per QUERY for a
    * whole query relation in ONE pass over the term-pruned postings —
    * the serving shape of a retrieval deployment, where queries arrive
    * in batches and the per-query corpus scan of [[topDocs]] (or even
    * a per-query index probe) would pay Q job overheads for work one
    * join can do.
    *
    * `qterms` is (qid, slot, tok) with slots 1..`slots` — the slot
    * fixes each term's position in the scoring sum, so the float adds
    * run in the SAME left-to-right order for every engine and every
    * partitioning (an unordered SUM over matched terms would make the
    * 4-decimal rounding partition-dependent). The union of the batch's
    * terms (a driver-held model-state fetch, bounded by queries ×
    * slots) pushes into the postings read as an `InSet`, so a stored
    * tok-sorted index scans only matching row groups — per-batch cost
    * tracks the BATCH's term postings, not the index. Per-term corpus
    * dfs fall out of the same pruned relation (postings are unique per
    * (tok, id)); scoring is the [[topDocs]] composition per slot with
    * a tf=0 slot contributing exact 0.0; ranks come from a window
    * partitioned by qid over the matched candidates (k-bounded output,
    * candidate-bounded input — the per-query equivalent of the
    * stop-gram df story: a ubiquitous query term makes its query's
    * candidate list corpus-sized, which is the query's cost to pay).
    *
    * Semantics: top-k among MATCHING documents only (ties by id after
    * 4-decimal rounding). Unlike [[topDocsIndexed]] there is no
    * unmatched-doc pad — a batched serve answers "best matches per
    * query", and a query whose terms match fewer than k docs returns
    * the short list. Emits (qid, idCol, score, rb). */
  def topDocsBatch(postings: DataFrame, doclen: DataFrame,
                   stats: DataFrame, idCol: String, qterms: DataFrame,
                   slots: Int = 3, k: Int = 20,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(slots >= 1 && k >= 1)
    val tokRows = graft.plans.Materialize.modelState(
      qterms.select(col("tok")).distinct(),
      "bm25 batch query-term dictionary (bounded: queries × slots)",
      1 << 20)
    val toks: Set[Any] = tokRows.map(_.getString(0): Any).toSet
    // pin once — the pruned relation feeds the df aggregate and the
    // scoring join; it is term-postings-sized, never corpus-sized
    val p = graft.plans.Materialize.stage(
      if (toks.isEmpty) postings.filter(lit(false))
      else postings.filter(
        org.apache.spark.sql.graft.ColumnBridge.inSet("tok", toks)))
    val tdf = p.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val joined = p
      .join(broadcast(qterms), Seq("tok"))
      .join(broadcast(tdf), Seq("tok"))
    val aggs = (1 to slots).flatMap { i => Seq(
      sum(when(col("slot") === i, col("tf")).otherwise(0L))
        .cast("long").as(s"tf_$i"),
      max(when(col("slot") === i, col("df"))).as(s"df_$i")) }
    val m = joined.groupBy(col("qid"), col(idCol))
      .agg(aggs.head, aggs.tail: _*)
    val perSlot: Seq[Column] = (1 to slots).map { i =>
      val tf = col(s"tf_$i")
      // df is only read when tf > 0 (the term matched this doc, so its
      // slot row joined and carried the real df); the coalesce keeps
      // the unmatched-slot NULL from poisoning the CASE's dead branch
      val dfq = coalesce(col(s"df_$i"), lit(1L))
      val idf = log((col("n_docs") - dfq + 0.5) / (dfq + 0.5) + 1.0)
      when(tf === 0L, lit(0.0)).otherwise(
        idf * (tf * (k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col(idCol))
    m.join(doclen, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col(idCol),
        round(perSlot.reduce(_ + _), 4).as("score"))
      .withColumn("rb", row_number().over(w).cast("int"))
      .filter(col("rb") <= k)
      .select(col("qid"), col(idCol), col("score"), col("rb"))
  }
}
