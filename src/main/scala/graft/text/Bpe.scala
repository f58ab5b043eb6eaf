package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Distributed BPE merge learning (Sennrich et al. 2016) over a word
  * DICTIONARY relation — the tokenizer-training step itself.
  *
  * The input is (word, cnt): distinct words with corpus frequencies —
  * the one corpus-sized pass happens BEFORE this operator, so every
  * merge round runs over the bounded dictionary expanded to
  * (word, pos, symbol) rows. That is the standard dictionary-BPE
  * formulation and what makes the trainer distributable: the
  * dictionary grows sublinearly with the corpus while raw-text BPE
  * would re-walk every token occurrence per round.
  *
  * Greedy left-to-right application — where "aaaa" under merge "aa"
  * must merge positions 1-2 and 3-4, never 2-3 — is inherently
  * sequential, but reduces to window functions: the hit positions of
  * the top pair form maximal runs of consecutive positions (islands),
  * and greedy selects exactly the ODD in-island ranks. Both the Spark
  * plan and the DuckDB oracle express that as lag-break → running-sum
  * island id → row_number parity.
  *
  * Per round: one pair-count aggregation (map-side combining), one
  * bounded 1-row top fetch (the KMeans-centroid stance), two
  * broadcast-sized joins for the rewrite, one renumbering window.
  * Round state is pinned once per round (multi-consumer: the pair
  * count and the rewrite both read it).
  */
object Bpe {

  /** Learn up to `rounds` merges from a (wordCol, cntCol) dictionary.
    * Returns (lhs, rhs, weighted frequency) per adopted merge, in
    * adoption order; stops early if no adjacent pair remains. Ties
    * break by (freq desc, lhs asc, rhs asc) — deterministic, so the
    * learned table is itself oracle-checkable. */
  def learnMerges(words: DataFrame, wordCol: String, cntCol: String,
                  rounds: Int): Seq[(String, String, Long)] = {
    require(rounds >= 1 && rounds <= 20, "rounds in [1,20]")
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    var seqs = words.select(col(wordCol).as("w"), col(cntCol).as("cnt"),
      posexplode(expr(
        "transform(sequence(1, length(" + wordCol + ")), " +
          "i -> substring(" + wordCol + ", i, 1))"))
        .as(Seq("pos", "sym")))
    val out = Seq.newBuilder[(String, String, Long)]
    var exhausted = false
    (1 to rounds).foreach { _ =>
      if (!exhausted) {
        seqs = graft.plans.Materialize.stage(seqs)
        val wn = graft.plans.Materialize.stage(
          seqs.withColumn("nxt", lead(col("sym"), 1).over(wWin)))
        val topRow: Option[Row] = wn.filter(col("nxt").isNotNull)
          .groupBy(col("sym"), col("nxt")).agg(sum(col("cnt")).as("f"))
          .orderBy(col("f").desc, col("sym"), col("nxt")).limit(1)
          .pipe(graft.plans.Materialize.modelState(_, "BPE round's top pair (1 row)"))
          .headOption
        topRow match {
          case None => exhausted = true // every word is one symbol
          case Some(top) =>
            val (tl, tr, f) =
              (top.getString(0), top.getString(1), top.getLong(2))
            out += ((tl, tr, f))
            val hits = wn.filter(col("sym") === tl && col("nxt") === tr)
              .withColumn("brk",
                when(col("pos") - lag(col("pos"), 1).over(wWin) === 1, 0L)
                  .otherwise(1L))
              .withColumn("isl", sum(col("brk")).over(wWin.rowsBetween(
                Window.unboundedPreceding, Window.currentRow)))
            val sel = hits
              .withColumn("rn", row_number().over(Window
                .partitionBy(col("w"), col("isl")).orderBy(col("pos"))))
              .filter(col("rn") % 2 === 1)
              .select(col("w"), col("pos"))
            seqs = wn
              .join(sel.withColumn("sel", lit(true)), Seq("w", "pos"), "left")
              .join(sel.select(col("w"), (col("pos") + 1).as("pos"))
                .withColumn("consumed", lit(true)), Seq("w", "pos"), "left")
              .filter(col("consumed").isNull)
              .select(col("w"), col("cnt"),
                when(col("sel"), concat(col("sym"), col("nxt")))
                  .otherwise(col("sym")).as("sym"), col("pos"))
              .withColumn("pos", row_number().over(wWin))
        }
      }
    }
    out.result()
  }
}
