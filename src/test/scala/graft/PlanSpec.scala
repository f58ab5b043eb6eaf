package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape gates — the 100 TB design rules as assertions:
  * filters/projections reach the parquet scan, tiny dims broadcast,
  * top-k never globally sorts, no cartesian products. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filter and projection are pushed to the parquet scan") {
    val plan = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string"), plan)
  }

  test("dimension joins broadcast the small side") {
    val plan = planOf("q_join_dims")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval join stays an equi join with a range residual") {
    val plan = planOf("q_interval_join")
    // equi key keeps it hash/sort-merge — never a nested-loop on range
    assert(plan.contains("Join") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("top-k runs through TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("report and merge plans contain no cartesian product") {
    Seq("q_report_daily", "q_merge_upsert", "q_merge_2key").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }

  test("whole-stage codegen covers the pricing-summary pipeline") {
    val df = SparkEntry.queries("q_pricing_summary")(spark, sf)
    df.collect() // AQE finalizes the plan only after execution
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" node prefixes mark whole-stage-codegen stages; the scan →
    // filter → project → partial-agg pipeline must be inside one
    assert(plan.contains("*(1) HashAggregate"), plan)
    assert(plan.contains("*(1) Filter"), plan)
  }
}
