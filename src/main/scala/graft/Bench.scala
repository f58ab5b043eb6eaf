package graft

/** Benchmark main: runs the headline query suite against
  * SPARK_GRAFT_SF_DIR and prints ONE parseable JSON line on stdout.
  * Per-query failures are reported (negative timing + stderr log), never
  * silently swallowed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("graft-bench")
    // optional args: bench only the named queries (dev loop)
    val qs =
      if (args.isEmpty) graft.queries.Registry.benchNames
      else {
        val known = graft.queries.Registry.benchNames.toSet
        val unknown = args.filterNot(known)
        // a typo'd name must not print a green zero-total line
        require(unknown.isEmpty,
          s"unknown bench queries: ${unknown.mkString(", ")}")
        graft.queries.Registry.benchNames.filter(args.toSet)
      }
    // One warm-up action so JVM/codegen startup isn't billed to the
    // first query in the list.
    Tables.load(spark, sfDir, "nation").count()
    // CALIBRATION: a fixed-cost, IO-free, data-independent query —
    // 400M codegen'd hashes across all 32 local threads — timed FIRST
    // and LAST in every run and reported in the JSON. Round-over-round
    // totals on this box are unreadable raw (PERF_NOTES logs 150.7 →
    // 199.4 s full-run spread on an UNCHANGED tree under ambient load);
    // the calibration pins what the machine was worth that run, so a
    // bench delta can be read as (total/cal) ratios instead of raw
    // seconds, and cal_last/cal_first exposes load drift WITHIN the
    // run. Min-of-2 like every entry, outside all entry timings.
    def calibrate(): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, 32)
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("id")).as("h"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    // one discarded pass first: the calibration measures MACHINE LOAD,
    // not this JVM's codegen/JIT warmth (a cold first pass read ~1.6×
    // the warm cost and would masquerade as ambient load)
    calibrate()
    val calFirst = calibrate()
    // Reset session state between timed attempts (outside the timed
    // region): the ingest/dedup entries leave behind memory-sink temp
    // views, localCheckpoint RDD blocks and cached relations, and over
    // a 100+-query suite that accumulation inflated late queries 3-5x
    // vs isolated runs (round-4 finding) — the suite was measuring JVM
    // debris, not the query.
    def resetState(): Unit = {
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      // Unload every streaming state-store provider: a terminated
      // AvailableNow query LEAVES its providers loaded (each holding
      // the full state map in memory and receiving 60 s maintenance
      // ticks), and the streaming entries run in child sessions this
      // loop's `spark.streams` can't see — by suite position ~160 the
      // accumulated providers inflated q_stream_containment's SECOND
      // attempt to 19.9 s (heap 9.6 GB, gc 0 ms) on the r9 driver run.
      try org.apache.spark.sql.execution.streaming.state
        .GraftStateStoreHygiene.unloadAllProviders()
      catch { case _: Throwable => () }
      // blocking: the next attempt must start from a clean block
      // manager, not race an async removal of its predecessor's blocks
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      spark.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    // Spark's ContextCleaner is reference-queue driven: dropped
    // localCheckpoint RDDs and broadcasts are only reaped after a JVM
    // GC enqueues them. Under a LARGE -Xmx (SPARK_DRIVER_MEM) the whole
    // suite can run before a single full GC, so block-manager debris
    // compounds and inflates late entries 3-5x — the round-8 driver run
    // showed 9-13 GB resident heap and 3x entry inflation from suite
    // position ~110 on, unreproducible at -Xmx8g where routine GCs kept
    // the cleaner current. Forcing a GC once per ENTRY (outside the
    // timed region, after both attempts) makes the suite heap-size
    // independent without paying the forced-GC churn (class unloading,
    // cold codegen caches) inside the min-of-2 attempts — a
    // between-attempt GC measurably re-chilled attempt 2 by ~10%
    // suite-wide.
    def reapDebris(): Unit = System.gc()
    // Two timed runs per query, keep the minimum: one local[32] JVM
    // shares cores with the OS, and min-of-2 strips scheduler noise
    // without hiding real cost.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // Per-attempt JVM telemetry: when a timing moves between rounds on
    // unchanged code, gc/heap pressure is the first suspect — record it
    // in the artifact so the investigation doesn't need a rerun.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapMb(): Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    final case class Attempt(sec: Double, gcMs: Long, heapMb: Long)
    val detail = qs.zipWithIndex.map { case (name, pos) =>
      // the production-plan variant where one exists (correctness-only
      // scaffolding like exact sketch twins stays out of the timings)
      val fn = graft.queries.Registry.benchQueries(name)
      val attempts = (1 to runs).map { _ =>
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        val t = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
        val a = Attempt(t, gcMillis() - gc0, heapMb())
        resetState()
        a
      }
      reapDebris()
      (name, pos, attempts)
    }
    val calLast = calibrate()
    val results = detail.map { case (name, _, attempts) =>
      name -> (if (attempts.exists(_.sec < 0)) -1.0 else attempts.map(_.sec).min)
    }
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    // The driver keeps only the last ~2000 chars of stdout (plus sbt's
    // trailing "[success]" line) when parsing this JSON — full-precision
    // timings for 70+ queries overflow that window and the line is lost.
    // Round to ms and, if still too long, keep the slowest entries and
    // report how many cheap ones were elided (their cost is in "value").
    // Locale.ROOT: the f interpolator honors the JVM default locale,
    // and a comma-decimal locale would emit invalid JSON
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def toJson(entries: Seq[(String, Double)], omitted: Int): String = {
      val qsJson = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cal_first":${fmt(calFirst)},"cal_last":${fmt(calLast)},"queries":$qsJson,"sf":"$sfDir","count":${results.size},"omitted":$omitted,"failed":${results.size - ok.size}}"""
    }
    val full = toJson(results, 0)
    val line =
      if (full.length <= 1500) full
      else {
        // Failed entries (-1.0) come first, then the slowest passing
        // queries; the combined list is capped so a failure-heavy run
        // cannot overflow the output window either ("failed" still
        // reports the full count).
        val keep = (results.filter(_._2 < 0) ++
          results.filter(_._2 >= 0).sortBy(-_._2)).take(40).map(_._1).toSet
        val kept = results.filter(r => keep(r._1))
        toJson(kept, results.size - kept.size)
      }
    println(line)
    // Full per-attempt detail — every query, every attempt, with gc/heap —
    // goes to a sidecar file (the stdout line is capped at ~1500 chars, so
    // it can't carry 130 queries × 3 fields × 2 attempts). The driver's
    // BENCH artifact stays parseable and byte-compatible; the repo keeps
    // the telemetry for regression forensics.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    // `pos` is the entry's index in the run order: order-dependent
    // effects (cache debris, heap pressure from a heavy neighbor) are
    // diagnosable from one artifact without re-deriving the schedule.
    val detailJson = detail.map { case (name, pos, attempts) =>
      val a = attempts.map(x =>
        s"""{"sec":${fmt(x.sec)},"gc_ms":${x.gcMs},"heap_mb":${x.heapMb}}""")
        .mkString("[", ",", "]")
      "\"" + name + "\":" + s"""{"pos":$pos,"attempts":$a}"""
    }.mkString("{\"sf\":\"" + sfDir + "\",\"attempts\":{", ",", "}}")
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detailJson.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    spark.stop()
  }
}
