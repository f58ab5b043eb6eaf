package graft.queries

/** End-to-end ingest-pipeline entries (rows-only checks; the DuckDB
  * oracle can't drive file ingest) — filled in as graft.ingest lands. */
object PipelineQueries {
  val defs: Seq[(String, Q)] = Seq.empty
}
