package graft.tools

/** Dev-only probe: print the executed plan of a registry entry. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session("plan-probe")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
