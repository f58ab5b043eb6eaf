package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — reproducible train/val/test
  * assignment for a training corpus. `randomSplit` re-rolls on every
  * run, shifts when partitioning changes, and can't be recomputed by
  * another engine; hashing the row KEY gives an assignment that is
  * stable across runs, engines, and repartitioning, lets a row's split
  * be answered point-wise ("which split is doc 123 in?"), and keeps
  * membership fixed as the corpus grows — all map-side, no shuffle, no
  * sampling pass.
  *
  * The hash is the md5-prefix integer (same construction as
  * `Dedup.md5Hash60`), salted with a caller seed so independent splits
  * of the same keys decorrelate. md5 is reproducible in any engine
  * (DuckDB: `('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT`),
  * which is what makes the oracle check of the whole assignment
  * possible.
  */
object Splits {

  /** Deterministic bucket in [0, buckets) for a key: uniform, stable,
    * engine-reproducible. The hash is the single shared md5-prefix
    * construction ([[graft.text.Dedup.md5Hash60]]) — its bit-exact
    * definition is load-bearing for the DuckDB oracles, so it lives in
    * exactly one place. */
  def bucketOf(key: Column, seed: String, buckets: Int = 10000): Column =
    pmod(
      graft.text.Dedup.md5Hash60(concat(lit(s"$seed:"), key.cast("string"))),
      lit(buckets.toLong))

  /** Add `bucket` and `split` columns assigning every row to one of the
    * named fractions (must sum to ≤ 1; any remainder falls into the
    * last split). Purely map-side. */
  def assign(df: DataFrame, keyCol: String, seed: String,
             fractions: Seq[(String, Double)],
             buckets: Int = 10000): DataFrame = {
    require(fractions.nonEmpty, "no splits given")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum to ${fractions.map(_._2).sum} > 1")
    val b = bucketOf(col(keyCol), seed, buckets)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * buckets))
    val split = fractions.init.zip(cuts.init)
      .foldLeft(when(lit(false), lit(""))) { case (acc, ((name, _), cut)) =>
        acc.when(col("bucket") < cut, lit(name))
      }
      .otherwise(lit(fractions.last._1))
    df.withColumn("bucket", b).withColumn("split", split)
  }
}
