package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage format that
  * shrinks a 100 TB float32 embedding corpus 4× (and the input format
  * int8-SIMD distance kernels want). Per vector: scale = 127 / max|x|,
  * q_i = floor(x_i · scale) ∈ [-127, 127], dequantization error
  * bounded by 1/scale per component.
  *
  * Entirely per-row expression work (map-side, codegen'd, no shuffle),
  * and deterministic: every emitted number is a pure function of the
  * row, so quantized tables are reproducible across runs, partitionings
  * and engines — floor semantics, not round-half-to-even, precisely so
  * any engine recomputes the identical codes. */
object Quantize {

  /** Add (`scaleCol`, `qCol`) to every row: the per-vector scale and
    * the int8 code array. Zero (and all-zero) vectors get scale 0 and
    * an all-zero code — they carry no direction to preserve.
    *
    * The floor is clamped at -127: when the max-magnitude component is
    * negative, the double product x·(127/max|x|) can round to just
    * past -127 (measured for ~18% of magnitudes) and floor would emit
    * -128, breaking the symmetric range symmetric-int8 kernels
    * assume. */
  def int8(df: DataFrame, vecCol: String,
           scaleCol: String = "scale", qCol: String = "q"): DataFrame =
    df.withColumn("__vd", VectorFunctions.toDoubleArray(col(vecCol)))
      .withColumn("__mx", array_max(transform(col("__vd"), x => abs(x))))
      // guard the division: ANSI mode throws on x / 0.0
      .withColumn(scaleCol,
        when(col("__mx") > 0, lit(127.0) / col("__mx")).otherwise(lit(0.0)))
      .withColumn(qCol,
        transform(col("__vd"), x =>
          greatest(floor(x * col(scaleCol)), lit(-127L)).cast("int")))
      .drop("__vd", "__mx")
}
