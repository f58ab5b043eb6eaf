package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Splits

/** Deterministic-split guarantees: fractions land near target, the
  * assignment is a pure function of (seed, key) — stable across runs,
  * repartitioning and corpus growth — and different seeds decorrelate. */
class SplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val keys = spark.range(10000).withColumnRenamed("id", "k")

  test("fractions land within 2% of target") {
    val n = Splits.assign(keys, "k", "s1", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(n("train") - 8000L) < 200, n)
    assert(math.abs(n("val") - 1000L) < 200, n)
    assert(math.abs(n("test") - 1000L) < 200, n)
  }

  test("assignment is stable across runs and repartitioning") {
    val a = Splits.assign(keys, "k", "s1", Seq("train" -> 0.5, "test" -> 0.5))
      .select("k", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assign(keys.repartition(13), "k", "s1", Seq("train" -> 0.5, "test" -> 0.5))
      .select("k", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("stored-label stage composition equals the inline operators") {
    // q_components_stage derives split + keep from PERSISTED labels;
    // the result must be exactly what the inline single-pass operators
    // produce — storing the stage can never change semantics
    val sf = TestSpark.sf
    import graft.text.{Dedup, TextFunctions}
    val staged = SparkEntry.queries("q_components_stage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getBoolean(3)))
    // inline split path: components → assign (q_leakage_split's shape)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" trailing")).as("text")))
    val inlineSplit = Splits.assign(
      Dedup.nearDupComponents(planted, "doc_id", "text", threshold = 0.5),
      "comp_id", seed = "graft",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "comp_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // inline keep path: quality-keeper survivors
    val inlineKept = Dedup.nearDupBestSurvivors(planted, "doc_id", "text",
      TextFunctions.qualityScore(col("text")), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(staged.nonEmpty)
    staged.foreach { case (id, comp, split, kept) =>
      assert(inlineSplit(id) === (comp, split), s"doc $id split/label drifted")
      assert(kept === inlineKept.contains(id), s"doc $id keep decision drifted")
    }
  }

  test("membership is fixed as the corpus grows (subset keeps its splits)") {
    val full = Splits.assign(keys, "k", "s1", Seq("train" -> 0.8, "test" -> 0.2))
      .select("k", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sub = Splits.assign(keys.filter(col("k") < 100), "k", "s1",
      Seq("train" -> 0.8, "test" -> 0.2))
      .select("k", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (k, s) => full(k) == s })
  }

  test("different seeds decorrelate") {
    val joined = Splits.assign(keys, "k", "s1", Seq("a" -> 0.5, "b" -> 0.5))
      .select(col("k"), col("split").as("s1"))
      .join(Splits.assign(keys, "k", "s2", Seq("a" -> 0.5, "b" -> 0.5))
        .select(col("k"), col("split").as("s2")), Seq("k"))
    val agree = joined.filter(col("s1") === col("s2")).count()
    assert(math.abs(agree - 5000L) < 300, agree) // ~50% agreement if independent
  }

  test("plan: assignment is map-side — no shuffle, no join") {
    val plan = Splits.assign(keys, "k", "s1", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("leakage-safe split: every near-dup cluster lands in ONE split") {
    // hashing on the cluster label means no cluster can straddle
    // train/test — the q_leakage_split contract, pinned directly
    val comps = graft.text.Dedup.nearDupComponents(
      graft.queries.TextQueries.plantedTrailing(spark, TestSpark.sf),
      "doc_id", "text", threshold = 0.5)
    val assigned = Splits.assign(comps, "comp_id", "graft",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val straddlers = assigned.groupBy(col("comp_id"))
      .agg(countDistinct(col("split")).as("ns"), count(lit(1)).as("members"))
      .filter(col("ns") > 1)
    assert(straddlers.count() === 0)
    // the fixture really does contain multi-member clusters (else the
    // invariant is vacuous)
    assert(assigned.groupBy(col("comp_id")).count()
      .filter(col("count") > 1).count() > 0)
  }

  test("tokenBudget fills each stratum to its budget; crossing doc included; stable") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", 100L))
      .toDF("id", "s", "w")
    val kept = graft.plans.Sampling.tokenBudget(df, "id", "s", col("w"),
      budget = 450L, seed = "t")
    // every row weighs 100: prior-total < 450 keeps exactly 5 rows per
    // stratum, the 5th CROSSING the budget (cum 500) — budgets fill,
    // they don't stall under
    kept.groupBy(col("s"))
      .agg(count(lit(1)).as("n"), max(col("cum_tokens")).as("m"))
      .collect().foreach { r =>
        assert(r.getLong(1) === 5L && r.getLong(2) === 500L, r)
      }
    // the kept SET is a pure function of (seed, keys) — repartitioning
    // must not change it
    val again = graft.plans.Sampling.tokenBudget(df.repartition(7), "id", "s",
      col("w"), budget = 450L, seed = "t")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(again === kept.select(col("id")).collect().map(_.getLong(0)).toSet)
  }

  test("fractions summing over 1 are refused") {
    intercept[IllegalArgumentException] {
      Splits.assign(keys, "k", "s1", Seq("a" -> 0.8, "b" -> 0.3))
    }
  }
}
