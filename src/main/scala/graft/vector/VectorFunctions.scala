package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` / `array<double>` columns,
  * backed by the native codegen expressions in
  * [[graft.functions.VectorExpressions]] (registered by
  * [[graft.GraftExtensions]]): one generated primitive loop per
  * evaluation instead of an interpreted zip_with/aggregate chain — the
  * difference is the whole cost of the ANN candidate-scoring path.
  * Elements promote to double before any arithmetic so results are
  * engine-portable IEEE 754 (the float32 values are exact in float64;
  * sequential left-to-right accumulation matches DuckDB's
  * list_cosine_similarity bit-for-bit). */
object VectorFunctions {

  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σᵢ aᵢ·bᵢ in double. Accepts float or double arrays directly — no
    * pre-cast pass needed. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (promoted to double), clamped to [-1, 1] —
    * rounding can push v·v/|v|² an ulp past 1, and the clamp also
    * matches DuckDB's list_cosine_similarity. One generated loop
    * computes the dot and both norms in a single pass. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Euclidean (L2) distance, double math. */
  def l2Distance(a: Column, b: Column): Column = {
    val diff = zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x - y)
    sqrt(aggregate(transform(diff, x => x * x), lit(0.0), (acc, x) => acc + x))
  }

  /** Literal query vector as a typed array column. */
  def vectorLit(v: Seq[Double]): Column =
    array(v.map(lit): _*)
}
