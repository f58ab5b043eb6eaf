package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distribution-drift arithmetic shared by the batch snapshot monitor
  * (`q_dist_drift`) and its streaming twin (`q_stream_drift`), so the
  * two surfaces can never diverge on the divergence.
  *
  * The quantity is the per-token Jensen-Shannon contribution
  * `0.5·p·ln(p/m) + 0.5·q·ln(q/m)` with `m = (p+q)/2`, provably ≥ 0
  * by the log-sum inequality, with the zero-count sides degenerating
  * to 0 (absent from P) or `0.5·q·ln 2` (novel in Q). Following the
  * LM family's numeric protocol the contribution is quantized to
  * integer NANO-units immediately, so corpus/batch totals are exact
  * BIGINT sums under any partitioning — the one float step per token
  * is the `floor`. */
object Drift {

  /** Quantized JS contribution of one token: `cA`/`cB` are the token's
    * counts in the two distributions, `nA`/`nB` the distribution
    * totals (all integer columns; at least one count > 0). */
  def contribNano(cA: Column, cB: Column, nA: Column, nB: Column): Column = {
    val pa = cA.cast("double") / nA.cast("double")
    val pb = cB.cast("double") / nB.cast("double")
    val m = (pa + pb) / lit(2.0)
    floor((lit(0.5) *
      when(cA > 0, pa * log(pa / m)).otherwise(lit(0.0)) +
      lit(0.5) *
      when(cB > 0, pb * log(pb / m)).otherwise(lit(0.0))) * lit(1e9))
      .cast("long")
  }
}
