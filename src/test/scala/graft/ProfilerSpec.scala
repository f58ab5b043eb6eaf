package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Profiler

/** Profiler semantics on a fixture with known nulls/cardinalities, plus
  * the scale rule: approx mode must avoid the Expand fan-out that exact
  * multi-distinct requires. */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq[(java.lang.Long, String)](
    (1L, "a"), (2L, "b"), (3L, "a"), (null, "a"), (5L, null))
    .toDF("k", "s")

  test("exact profile: counts, null rate, cardinality per column") {
    val got = Profiler.profile(df, Seq("k", "s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("k", 5L, 4L, 4L), ("s", 5L, 4L, 2L)))
  }

  test("approx profile: HLL cardinalities within 5% on 10k distinct keys") {
    val big = spark.range(10000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS s")
    val got = Profiler.profile(big, Seq("k", "s"), approx = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("k") - 10000L) <= 500, got)
    assert(got("s") == 7L, got) // small cardinalities are exact under HLL
  }

  test("column names containing dots profile fine") {
    val dotted = df.withColumnRenamed("k", "a.b")
    val got = Profiler.profile(dotted, Seq("a.b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a.b", 5L, 4L, 4L)))
  }

  test("plan: exact mode expands, approx mode stays a narrow single pass") {
    val exact = Profiler.profile(df, Seq("k", "s")).queryExecution
      .optimizedPlan.toString
    val approx = Profiler.profile(df, Seq("k", "s"), approx = true)
      .queryExecution.optimizedPlan.toString
    assert(exact.contains("Expand"), exact)
    assert(!approx.contains("Expand"), approx)
  }
}
