package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the dataset health check a training-data
  * pipeline runs before committing 100 TB to a tokenizer: row count,
  * per-column null rate and cardinality, in long format (one row per
  * profiled column).
  *
  * Exact mode computes `count(DISTINCT c)` for every column in ONE
  * aggregate — Catalyst plans multi-distinct via Expand (each input row
  * fans out once per distinct group), so the pass stays single-scan at
  * the cost of a ×cols row expansion before the partial aggregate.
  * At 100 TB that expansion is the dominant cost, so `approx = true`
  * switches to HyperLogLog++ (`approx_count_distinct`), which needs no
  * Expand and keeps the whole profile one narrow codegen'd pass —
  * cardinalities then carry the usual ~2% HLL error (gated in
  * ProfilerSpec).
  */
object Profiler {

  /** Profile `cols` of `df`: (column, n_rows, n_nonnull, n_distinct),
    * one output row per column, ordered as given. */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    // backtick-quote every reference: `cols` names top-level columns
    // verbatim, so a dot in a name must not parse as field access
    val qcol = (c: String) => col(s"`$c`")
    val distinctOf =
      if (approx) (c: String) => approx_count_distinct(qcol(c))
      else (c: String) => countDistinct(qcol(c))
    val aggs = cols.flatMap { c =>
      Seq(count(qcol(c)).as(s"__nn_$c"), distinctOf(c).as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // backtick-quote the synthesized names: a profiled column named
    // "a.b" aliases fine, but a bare col("__nn_a.b") would re-parse the
    // dot as struct-field access
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"`__nn_$c`").as("n_nonnull"), col(s"`__nd_$c`").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
