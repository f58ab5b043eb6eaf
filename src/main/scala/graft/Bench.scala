package graft

/** Benchmark main: runs the headline query suite against
  * SPARK_GRAFT_SF_DIR and prints ONE parseable JSON line on stdout.
  * Per-query failures are reported (negative timing + stderr log), never
  * silently swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("graft-bench")
    val qs = graft.queries.Registry.benchNames
    // One warm-up action so JVM/codegen startup isn't billed to the
    // first query in the list.
    Tables.load(spark, sfDir, "nation").count()
    // Two timed runs per query, keep the minimum: one local[32] JVM
    // shares cores with the OS, and min-of-2 strips scheduler noise
    // without hiding real cost.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = qs.map { name =>
      val fn = SparkEntry.queries(name)
      val timings = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0 }
      }
      name -> (if (timings.exists(_ < 0)) -1.0 else timings.min)
    }
    val ok = results.filter(_._2 >= 0)
    val qsJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsJson,"sf":"$sfDir","failed":${results.size - ok.size}}""")
    spark.stop()
  }
}
