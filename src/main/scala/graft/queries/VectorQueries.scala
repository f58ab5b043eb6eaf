package graft.queries

/** Embedding similarity-search suite over `embeddings` — filled in as
  * the graft.vector package lands. */
object VectorQueries {
  val defs: Seq[(String, Q)] = Seq.empty
}
