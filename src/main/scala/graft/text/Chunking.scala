package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking — the complement of [[Packing]]: where
  * packing concatenates short documents up to a token budget, chunking
  * splits long documents DOWN into overlapping token windows so every
  * training sequence fits the context length and no text is dropped.
  *
  * Pure expression pipeline: tokenize once, derive the chunk count
  * arithmetically, explode a chunk-index sequence, slice the token
  * array per index. No shuffle at all — chunking is embarrassingly
  * row-parallel, and the explode fan-out is exactly the output size. */
object Chunking {

  /** Split each document into windows of `budget` tokens advancing by
    * `budget - overlap` tokens; the final window may be short, and a
    * document at or under the budget yields exactly one chunk.
    * Returns (idCol, chunk_index, chunk_text, n_tokens). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            budget: Int, overlap: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(overlap >= 0 && overlap < budget,
      s"overlap $overlap must be in [0, budget)")
    val step = budget - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // bind through named columns: tokenization runs once per row, not
    // once per produced chunk
    val base = df.select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
    val nChunks = greatest(
      (ceil((col("__n") - lit(budget)).cast("double") / lit(step.toDouble)) + 1)
        .cast("int"),
      lit(1))
    base
      .withColumn("chunk_index", explode(sequence(lit(0), nChunks - 1)))
      .select(col(idCol), col("chunk_index"),
        array_join(slice(col("__toks"), col("chunk_index") * step + 1, lit(budget)), " ")
          .as("chunk_text"),
        least(col("__n") - col("chunk_index") * step, lit(budget)).as("n_tokens"))
  }
}
