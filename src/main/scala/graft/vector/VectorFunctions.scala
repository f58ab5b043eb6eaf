package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns as pure codegen'd
  * expressions (zip_with / aggregate), promoted to double before any
  * arithmetic so results are engine-portable IEEE 754 (the float32
  * values are exact in float64; sequential left-to-right accumulation
  * matches DuckDB's list_cosine_similarity bit-for-bit). */
object VectorFunctions {

  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float vectors (promoted to double),
    * clamped to [-1, 1] — rounding can push v·v/|v|² an ulp past 1, and
    * the clamp also matches DuckDB's list_cosine_similarity. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    least(greatest(dot(ad, bd) / (norm(ad) * norm(bd)), lit(-1.0)), lit(1.0))
  }

  /** Euclidean (L2) distance, double math. */
  def l2Distance(a: Column, b: Column): Column = {
    val diff = zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x - y)
    sqrt(aggregate(transform(diff, x => x * x), lit(0.0), (acc, x) => acc + x))
  }

  /** Literal query vector as a typed array column. */
  def vectorLit(v: Seq[Double]): Column =
    array(v.map(lit): _*)
}
