package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Resample, Sampling, Sessionize}
import graft.text.TfIdf

/** Handcrafted-fixture semantics for the batch time-series / sampling /
  * keyword operators (their end-to-end values are oracle-checked by
  * q_sessionize / q_gapfill / q_stratified_sample / q_tfidf; these pin
  * the edge cases small fixtures show best). */
class PlanOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap merges and splits, ties broken by tie column") {
    import spark.implicits._
    // user 1: two sessions (06:00 jump > 1h gap); user 2: one session
    // with two equal-timestamp events (tie on event_id keeps both)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 00:30:00"), 11L, 2.0),
      (1L, ts("2024-01-01 06:00:00"), 12L, 4.0),
      (2L, ts("2024-01-01 01:00:00"), 20L, 1.5),
      (2L, ts("2024-01-01 01:00:00"), 21L, 2.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.batch(ev, "user_id", "ts", "event_id", "value",
      gapSeconds = 3600)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getDouble(5)))
    assert(out === Seq(
      (1L, 1, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 2L, 3.0),
      (1L, 2, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:00"), 1L, 4.0),
      (2L, 1, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 2L, 4.0)))
  }

  test("sessionize: boundary gap exactly equal to the threshold merges") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val n = Sessionize.batch(ev, "user_id", "ts", "event_id", "value", 3600)
      .count()
    assert(n === 1L)
  }

  test("gapFill: holes zero-filled, LOCF carries last seen value") {
    import spark.implicits._
    // group 'a': hours 00,01,03 present -> hour 02 synthesized
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 01:20:00"), 2.0),
      ("a", ts("2024-01-01 03:30:00"), 4.0),
      ("b", ts("2024-01-01 05:00:00"), 9.0)
    ).toDF("g", "ts", "value")
    val out = Resample.gapFill(ev, "g", "ts", "value", "hour")
      .orderBy("g", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out === Seq(
      ("a", "00", 1L, 1.0, 1.0),
      ("a", "01", 1L, 2.0, 2.0),
      ("a", "02", 0L, 0.0, 2.0), // synthesized: zero count, LOCF value
      ("a", "03", 1L, 4.0, 4.0),
      ("b", "05", 1L, 9.0, 9.0)))
  }

  test("stratified: rates hit per stratum, subset stable as corpus grows") {
    val base = spark.range(10000)
      .select(col("id"),
        when(pmod(col("id"), lit(2)) === 0, "en").otherwise("fr").as("lang"))
    val kept = Sampling.stratified(base, "id", "lang",
      Seq("en" -> 0.2), defaultRate = 1.0, seed = "t")
    val n = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(n("en") - 1000L) < 150, n)   // 5000 * 0.2
    assert(n("fr") === 5000L)                    // default keeps all
    // determinism: the kept set over a prefix equals the prefix of the kept set
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    val sub = Sampling.stratified(base.filter(col("id") < 1000), "id", "lang",
      Seq("en" -> 0.2), 1.0, "t").select("id").collect().map(_.getLong(0)).toSet
    assert(sub === keptIds.filter(_ < 1000))
  }

  test("temperature mixture: τ=1 keeps all, τ=0.5 evens the mix, corpus path has one shuffle") {
    val base = spark.range(10000)
      .select(col("id"),
        // 80/20 split: en dominates 4:1
        when(pmod(col("id"), lit(5)) < 4, "en").otherwise("fr").as("lang"))
    // τ=1 → natural mixture untouched
    assert(Sampling.temperatureMixture(base, "id", "lang", 1.0, "t").count() === 10000L)
    // τ=0.5 → rate_en = sqrt(2000/8000) = 0.5, rate_fr = 1.0
    val kept = Sampling.temperatureMixture(base, "id", "lang", 0.5, "t")
    val n = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("fr") === 2000L, n)                  // smallest stratum whole
    assert(math.abs(n("en") - 4000L) < 300, n)    // 8000 * 0.5
    // deterministic: same call, same keep set
    val again = Sampling.temperatureMixture(base, "id", "lang", 0.5, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("id").collect().map(_.getLong(0)).toSet)
    // plan: the only hash exchange is the tiny per-stratum count agg —
    // the corpus data path is scan → broadcast join → filter
    val plan = kept.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("quality checks: exact violation counts, row checks in one scan") {
    import spark.implicits._
    import graft.plans.Quality
    val df = Seq(
      (Some(1L), "A", 10.0), (Some(1L), "A", 40.0), // dup key, one q>30
      (Some(2L), "X", 5.0),                         // bad enum
      (None, "N", 31.0)                             // null key, q>30
    ).toDF("k", "flag", "q")
    val rows = Quality.rowChecks(df, Seq(
      Quality.notNull("k"),
      Quality.accepted("flag", Seq("A", "N", "R")),
      Quality.RowCheck("q_le_30", col("q") > 30)))
    val dim = Seq(1L).toDF("dk")
    val out = Quality.report(rows,
      Quality.unique(df.filter(col("k").isNotNull), "k_unique", Seq("k")),
      Quality.refIntegrity(df.filter(col("k").isNotNull), "k_ri", "k", dim, "dk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("k_not_null" -> 1L, "flag_accepted" -> 1L,
      "q_le_30" -> 2L, "k_unique" -> 1L, "k_ri" -> 1L))
    // same-named surrogate keys (fact.customer_id vs dim.customer_id)
    // must not trip an ambiguous-reference AnalysisException
    val sameName = Quality.refIntegrity(
      df.filter(col("k").isNotNull), "k_ri2", "k", Seq(1L).toDF("k"), "k")
      .collect().head
    assert((sameName.getString(0), sameName.getLong(1)) === ("k_ri2", 1L))
    // the three row checks must share ONE pass over the input
    val plan = rows.queryExecution.optimizedPlan.toString
    assert("LocalRelation|Relation".r.findAllIn(plan).size == 1, plan)
  }

  test("incremental dedup: in-batch keep-first plus historical anti join") {
    import spark.implicits._
    val hist = Seq((1L, "alpha")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, " alpha "),   // dup of history (normalized) — dropped
      (11L, "beta"), (12L, "beta  "), // in-batch dup — 11 survives
      (13L, "gamma")
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup.incrementalDedup(batch, hist, "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(11L, 13L))
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("tfidf: common term ranks below distinctive terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "apple date date")
    ).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
    // 'apple' is in every doc (lowest idf) -> never the top term
    assert(top === Seq(1L -> "banana", 2L -> "cherry", 3L -> "date"))
  }

  test("tfidf: k bounds output and ranks are dense from 1") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "a b")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", k = 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out === Seq((1L, 3L, 1, 3), (2L, 2L, 1, 2)))
  }

  test("weightedSample: k covers the stratum, raising a weight never worsens its rank, no Window in the plan") {
    import spark.implicits._
    val df = (1L to 8L).map(i => (i, "s", 1.0)).toDF("id", "g", "w")
    // k ≥ stratum size → every row sampled exactly once, ranks 1..8
    val all = Sampling.weightedSample(df, "g", "w", "id", k = 20, seed = "t")
    assert(all.count() === 8)
    assert(all.select("rk").collect().map(_.getLong(0)).sorted
      === (1L to 8L).toArray)
    // determinism: the same call twice is bit-identical
    val again = Sampling.weightedSample(df, "g", "w", "id", k = 20, seed = "t")
    assert(all.orderBy("rk").collect().toSeq === again.orderBy("rk").collect().toSeq)
    // A-ES monotonicity: key = ln(u)/w with u fixed by (id, seed), so
    // raising ONE row's weight raises only its own key — its rank can
    // only improve (or hold), never degrade
    def rankOf(weights: Map[Long, Double], id: Long): Long = {
      val wdf = (1L to 8L).map(i => (i, "s", weights.getOrElse(i, 1.0)))
        .toDF("id", "g", "w")
      Sampling.weightedSample(wdf, "g", "w", "id", k = 20, seed = "t")
        .filter(col("id") === id).select("rk").head().getLong(0)
    }
    val base = rankOf(Map.empty, 4L)
    val boosted = rankOf(Map(4L -> 100.0), 4L)
    assert(boosted <= base, s"boosting weight degraded rank: $base -> $boosted")
    assert(rankOf(Map(4L -> 1e6), 4L) === 1L) // dominant weight wins outright
    // scale shape: the ranking is the native top-k aggregate, not a
    // window sort — map-side partials cut each stratum to ≤ k rows
    val plan = all.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_topk"), plan)
  }

  test("distributed prefix sum equals the single-window form at every partition count") {
    import spark.implicits._
    // non-contiguous keys, varied weights — offsets must be the sum of
    // all strictly-smaller keys' weights no matter how ranges land
    val rows = Seq(3L -> 5L, 10L -> 1L, 7L -> 2L, 100L -> 7L, 42L -> 3L,
      1L -> 4L, 55L -> 6L)
    val df = rows.toDF("k", "w")
    val expected = rows.sortBy(_._1)
      .scanLeft(0L -> 0L) { case ((_, acc), (_, w)) => 0L -> (acc + w) }
      .map(_._2).init
      .zip(rows.sortBy(_._1).map(_._1)).map { case (off, k) => k -> off }
      .toMap
    for (p <- Seq(1, 2, 5, 32)) {
      val got = graft.plans.PrefixSum.exclusiveOffsets(df, "k", "w", p)
        .select(col("k"), col("offset")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"partitions=$p: $got")
    }
  }

  test("prefix sum under the reliable-checkpoint mode: identical offsets, null and type guards") {
    import spark.implicits._
    val rows = Seq(3L -> 5L, 10L -> 1L, 7L -> 2L, 100L -> 7L, 1L -> 4L)
    val expected = graft.plans.PrefixSum
      .exclusiveOffsets(rows.toDF("k", "w"), "k", "w")
      .select(col("k"), col("offset")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Materialize.stage switches EVERY stage pin (prefix sum included)
    // to reliable .checkpoint() on a flagged session — offsets must be
    // bit-identical and checkpoint files must actually land
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-ps")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val rel = spark.newSession()
    rel.conf.set("graft.checkpoint.reliable", "true")
    val relDf = rel.createDataFrame(rows).toDF("k", "w")
    val got = graft.plans.PrefixSum.exclusiveOffsets(relDf, "k", "w")
      .select(col("k"), col("offset")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(java.nio.file.Files.walk(dir).filter(_.toFile.isFile).count() > 0)
    // a NULL weight contributes 0 to downstream offsets, not an NPE
    val withNull = Seq((1L, java.lang.Long.valueOf(4L)),
      (2L, null: java.lang.Long), (3L, java.lang.Long.valueOf(2L)))
      .toDF("k", "w")
    val n = graft.plans.PrefixSum.exclusiveOffsets(withNull, "k", "w", 2)
      .select(col("k"), col("offset")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 0L, 2L -> 4L, 3L -> 4L), n)
    // a fractional weight column is rejected loudly, not CCE'd
    val frac = Seq(1L -> 1.5, 2L -> 2.5).toDF("k", "w")
    intercept[IllegalArgumentException] {
      graft.plans.PrefixSum.exclusiveOffsets(frac, "k", "w")
    }
  }

  test("prefix sum has no unpartitioned window in its plan") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("k", "w")
    val plan = graft.plans.PrefixSum.exclusiveOffsets(df, "k", "w")
      .queryExecution.executedPlan.toString
    // the per-partition running sum partitions by __pid — a global
    // Window.orderBy with no partition key would print this warning
    // shape instead: windowspecdefinition(k ASC ...) with no partition
    assert(!plan.contains("windowspecdefinition(k#"), plan)
  }
}
