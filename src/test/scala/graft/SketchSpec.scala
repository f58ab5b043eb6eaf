package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sketch accuracy contract and its bench split.
  *
  * `q_sketch_error`'s correctness form runs exact twins
  * (countDistinct + exact percentile) beside the sketches so the DuckDB
  * oracle can verify the accuracy bound every round. The Bench suite
  * times a production-plan variant WITHOUT the twins — this spec pins
  * both halves of that split: the contract still holds (flags all
  * true), and the timed plan is genuinely the sketch-only plan (no
  * Expand from multi-distinct, no exact percentile sort-aggregate). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sketch accuracy contract holds: every tolerance flag is true") {
    val rows = queries.Registry.queries("q_sketch_error")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("distinct_ok")),
        s"HLL++ distinct drifted past 5% for ${r.get(0)}")
      assert(r.getBoolean(r.fieldIndex("p50_ok")),
        s"approx p50 drifted past 1% for ${r.get(0)}")
    }
  }

  test("bench variant times the production plan: sketches only, no exact twins") {
    val q = queries.Registry.all.collectFirst {
      case ("q_sketch_error", q) => q
    }.get
    assert(q.benchFn.isDefined, "q_sketch_error lost its bench variant")
    val benchPlan = queries.Registry.benchQueries("q_sketch_error")(spark, sf)
      .queryExecution.executedPlan.toString
    // exact multi-distinct would show as an Expand; exact percentile as
    // a percentile(...) aggregate — neither belongs in the timed plan
    val exactPercentile = "(?<!approx_)percentile\\(value".r
    assert(!benchPlan.contains("Expand"), benchPlan)
    assert(exactPercentile.findFirstIn(benchPlan.toLowerCase).isEmpty, benchPlan)
    assert(benchPlan.contains("approx_count_distinct"), benchPlan)
    assert(benchPlan.contains("approx_percentile"), benchPlan)
    // and the correctness form really does carry the twins the oracle
    // checks (the split must never silently drop the contract side)
    val fullPlan = queries.Registry.queries("q_sketch_error")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(fullPlan.contains("approx_count_distinct"), fullPlan)
    assert(exactPercentile.findFirstIn(fullPlan.toLowerCase).isDefined, fullPlan)
  }

  test("count-min sketch never undercounts and is repartition-invariant") {
    import org.apache.spark.sql.functions._
    val grams = Tables.load(spark, sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val a = text.CorpusStats
      .countMinEstimates(grams, "w", depth = 4, width = 16, probeMod = 1)
    val rows = a.collect()
    assert(rows.nonEmpty)
    // the CMS guarantee: estimates are exact counts plus non-negative
    // collision noise — one undercount anywhere is a sketch bug
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("overcount")) >= 0L, r.toString)
    }
    // width 16 over this stream forces collisions — the min-over-rows
    // must actually be doing estimation, not echoing exact counts
    assert(rows.exists(r => r.getLong(r.fieldIndex("overcount")) > 0L))
    // cells are plain sums of deterministic hashes: any partitioning
    // lands on identical estimates
    val b = text.CorpusStats
      .countMinEstimates(grams.repartition(17), "w",
        depth = 4, width = 16, probeMod = 1)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
