package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.Quantize

/** int8 quantization invariants: code range, reconstruction error
  * bound, zero-vector guard, and the map-side (no shuffle) plan. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(0.5f, -1.0f, 0.25f, 2.0f)),
    (1L, Array(-0.003f, 0.001f, 0.002f, -0.001f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
    // negative max-magnitude: -3.0 * (127/3.0) rounds past -127 in
    // doubles and an unclamped floor would emit -128
    (3L, Array(-3.0f, 1.0f, 0.0f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("codes stay in [-127, 127] and the max-magnitude component hits 127") {
    val rows = Quantize.int8(vecs, "embedding").orderBy("vec_id").collect()
    val q0 = rows(0).getSeq[Int](3)
    assert(q0.max == 127 && q0.forall(c => c >= -127 && c <= 127), q0)
    // scale = 127/2.0 = 63.5; 0.5*63.5 = 31.75 → 31; -1.0*63.5 → -64
    assert(q0 == Seq(31, -64, 15, 127), q0)
    // the negative-max vector clamps at -127, never -128
    val q3 = rows(3).getSeq[Int](3)
    assert(q3.min == -127 && q3.forall(_ >= -127), q3)
  }

  test("dequantization error is bounded by 1/scale per component") {
    val rows = Quantize.int8(vecs, "embedding")
      .filter(col("scale") > 0).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val q = r.getSeq[Int](3)
      x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(xi - qi / scale) <= 1.0 / scale + 1e-12,
          s"$xi vs $qi/$scale")
      }
    }
  }

  test("zero vectors quantize to scale 0 with an all-zero code") {
    val r = Quantize.int8(vecs, "embedding")
      .filter(col("vec_id") === 2).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getSeq[Int](3).forall(_ == 0))
  }

  test("plan: quantization is map-side — no shuffle") {
    val plan = Quantize.int8(vecs, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
