package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Packing

/** Greedy-packing guarantees: exact bin assignment on a hand-checked
  * fixture, the budget invariant (only oversized singletons exceed it),
  * determinism under repartitioning, and the scale rule that only the
  * (id, weight) projection shuffles. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-checked greedy assignment, oversized doc gets its own bin") {
    // budget 10, one shard: 4+5 | 3+6 | 11 (oversized) | 2
    val df = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 6L), (4L, 11L), (5L, 2L))
      .toDF("doc_id", "w")
    val got = Packing.packGreedy(df, "doc_id", col("w"), budget = 10, shardSize = 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(got.toSeq == Seq(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("budget invariant: every multi-doc bin fits the budget") {
    val df = spark.range(500).select(col("id").as("doc_id"),
      (pmod(col("id") * 37, lit(90)) + 1).as("w"))
    val packed = Packing.packGreedy(df, "doc_id", col("w"), budget = 128, shardSize = 50)
    val over = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > 128 && col("n") > 1)
    assert(over.count() == 0)
    assert(packed.count() == 500) // every doc assigned exactly once
  }

  test("bins are contiguous in id order within a shard") {
    val df = spark.range(200).select(col("id").as("doc_id"), lit(40L).as("w"))
    val rows = Packing.packGreedy(df, "doc_id", col("w"), budget = 128, shardSize = 100)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getInt(2)))
    rows.sliding(2).foreach {
      case Array((s1, b1), (s2, b2)) =>
        if (s1 == s2) assert(b2 == b1 || b2 == b1 + 1)
      case _ =>
    }
  }

  test("assignment is independent of input partitioning") {
    val df = spark.range(300).select(col("id").as("doc_id"),
      (pmod(col("id") * 13, lit(60)) + 1).as("w"))
    val a = Packing.packGreedy(df, "doc_id", col("w"), 100, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Packing.packGreedy(df.repartition(17), "doc_id", col("w"), 100, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("randomized equivalence vs a scalar greedy reference (seeded)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 3).foreach { round =>
      val docs = Seq.tabulate(300)(i => (i.toLong, (rnd.nextInt(120) + 1).toLong))
      val got = Packing.packGreedy(docs.toDF("doc_id", "w"), "doc_id", col("w"),
        budget = 100, shardSize = 64)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
      // reference: greedy scan per shard in id order
      val expected = docs.groupBy(_._1 / 64).flatMap { case (shard, ds) =>
        var bin = 0; var acc = -1L
        ds.sortBy(_._1).map { case (id, w) =>
          if (acc < 0) acc = w
          else if (acc + w <= 100) acc += w
          else { bin += 1; acc = w }
          id -> (shard, bin)
        }
      }
      assert(got == expected, s"round $round")
    }
  }

  test("plan: one exchange, and only the narrow (id, shard, w) projection shuffles") {
    val wide = spark.range(100).select(col("id").as("doc_id"),
      lit(7L).as("w"), concat(lit("x"), col("id")).as("payload"))
    val qe = Packing.packGreedy(wide, "doc_id", col("w"), 64, 50).queryExecution
    val plan = qe.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("payload"), plan) // text never shuffles
  }
}
