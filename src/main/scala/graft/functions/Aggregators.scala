package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface — custom aggregation logic that runs
  * through Spark's normal partial/merge machinery (map-side combine,
  * then one shuffle of fixed-size buffers), the API a library user
  * reaches for when a metric isn't expressible as built-in aggregates.
  *
  * Buffers here are integer micro-units, not doubles: partial sums
  * merge in arbitrary order across partitions, so only an
  * order-independent (exact) accumulation gives results that are
  * reproducible across runs, partitionings and engines. */
object Aggregators {

  /** Weighted mean with exact integer accumulation: values arrive as
    * (value_cents, weight) longs; the mean is computed once, at the
    * end, as `(Σ w·cents / 100) / Σ w` in double. */
  final class WeightedMean
      extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) Double.NaN
      else (r._1.toDouble / 100.0) / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
