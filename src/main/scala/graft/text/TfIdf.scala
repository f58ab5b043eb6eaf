package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction — the per-document top-k salient terms a
  * corpus pipeline uses for topic tagging and near-dup triage.
  *
  * Fully declarative: explode → two hash aggregations (term frequency
  * per doc, document frequency per term) → a term-keyed join → one
  * windowed top-k. The corpus size N reaches every row as a broadcast
  * one-row cross join (a scalar, not a window over the whole corpus).
  * At scale the tf ⋈ df join is term-partitioned sort-merge by default
  * — the vocabulary can be huge — and AQE downgrades it to broadcast
  * when the vocabulary of the actual run fits.
  *
  * idf is the smoothed sklearn form `ln((N+1)/(df+1)) + 1`, so terms
  * present in every document still score > 0 and nothing divides by
  * zero. Scores are rounded to 4 decimals BEFORE ranking: the rank is
  * then a pure function of the emitted values, deterministic across
  * engines, with the term string as total tiebreak.
  */
object TfIdf {

  /** Top-`k` terms per document by TF-IDF. Tokens are
    * lowercased whitespace splits (the corpus convention shared with
    * [[TextFunctions.tokenCount]]). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
