package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share long
  * n-grams with an evaluation set, the standard guard against test-set
  * leakage in a training corpus (the 13-gram rule of GPT-3 appendix C /
  * PaLM; the window length is a parameter here).
  *
  * Shape chosen for 100 TB: the EVAL side is tiny by construction
  * (benchmarks are thousands of documents, the corpus is billions), so
  * its distinct n-gram set is collected into a broadcast hash relation
  * and the corpus-side probe is MAP-SIDE — the corpus text never
  * shuffles; the only exchange is the final per-document count
  * aggregation. Grams are deduplicated per document BEFORE the probe so
  * a repeated phrase inside one document counts once and the join
  * output stays bounded by distinct-grams, not token count.
  */
object Decontaminate {

  /** Distinct word n-grams per document as 64-bit shingle hashes,
    * exploded to one row each. Gram STRINGS are never materialized —
    * each n-gram hashes straight off the per-token hashes
    * ([[Dedup.shingleHashesFromTokenHashes]]), so probe rows are fixed
    * 8-byte words and no text-sized data ever moves. Overlap counts
    * match the string semantics modulo a 64-bit collision between a
    * corpus gram and an eval gram (P ≈ |corpus grams|·|eval grams|·2⁻⁶⁴
    * — vanishing). Documents shorter than `n` tokens contribute nothing
    * (and are therefore never flagged — a document that cannot contain
    * the window cannot match it). */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      Dedup.tokenHashes(col(textCol)).as("__th"))
      .select(col("id"), explode(array_distinct(
        Dedup.shingleHashesFromTokenHashes(col("__th"), n))).as("gram"))

  /** Every corpus document with the number of distinct eval n-grams it
    * shares and a 0/1 contaminated flag. Clean documents are kept in
    * the output with n_shared = 0 — the caller filters, because a
    * decontamination report needs the clean rows too (audit trail of
    * what was checked, not just what was caught). */
  def overlap(corpus: DataFrame, eval: DataFrame, idCol: String,
              textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = broadcast(
      docGrams(eval, idCol, textCol, n).select(col("gram")).distinct())
    val hits = docGrams(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared")) // grams already distinct per doc
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"))
  }

  /** [[overlap]] plus SEVERITY: per document, its distinct-n-gram
    * count, how many hit the eval set, and the hit fraction (rounded
    * to 4 decimals; 0.0 for documents shorter than `n` tokens). The
    * binary flag quarantines; the ratio is what a curation pipeline
    * thresholds and audits — "5% of this document is benchmark text"
    * is a different decision than one incidental shared phrase. Same
    * single-explode + broadcast-probe shape as [[overlap]]: the
    * severity comes free from turning the semi join into a counted
    * left join against the (tiny, broadcast) eval gram set. */
  def overlapRatio(corpus: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = broadcast(
      docGrams(eval, idCol, textCol, n).select(col("gram")).distinct()
        .withColumn("__hit", lit(1L)))
    val per = docGrams(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
    corpus.select(col(idCol).as("id"))
      .join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)) /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)).cast("double"), 4)
          .as("contam_ratio"))
  }
}
