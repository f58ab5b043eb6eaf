package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified sampling — per-stratum keep rates for class rebalancing
  * (downsample the dominant language/source before training). Same
  * design stance as [[Splits]]: the keep decision is a salted hash of
  * the row KEY against a per-stratum threshold, so the sample is
  * deterministic, stable under repartitioning and corpus growth,
  * point-wise answerable, and recomputable by any engine — none of
  * which holds for `DataFrame.sampleBy`'s RNG. Purely map-side: no
  * shuffle, no sampling pass, and the filter sits directly above the
  * scan where Catalyst can push compatible predicates down.
  */
object Sampling {

  /** Keep each row with its stratum's rate (default `defaultRate` for
    * strata not listed). Rates are a small literal when-chain, not a
    * join — strata sets are enum-sized by construction. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Seq[(String, Double)], defaultRate: Double,
                 seed: String, buckets: Int = 10000): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val cut = rates
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (stratum, r)) =>
        acc.when(col(strataCol) === stratum, lit(math.round(r * buckets)))
      }
      .otherwise(lit(math.round(defaultRate * buckets)))
    df.filter(Splits.bucketOf(col(keyCol), seed, buckets) < cut)
  }
}
