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
}
