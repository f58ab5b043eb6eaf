package graft.queries

/** Text-analysis + dedup suite over `documents` — filled in as the
  * graft.text package lands. */
object TextQueries {
  val defs: Seq[(String, Q)] = Seq.empty
}
