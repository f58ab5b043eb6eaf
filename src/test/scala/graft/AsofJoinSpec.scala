package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsofJoin

/** As-of join semantics on hand-built fixtures: nearest-at-or-before
  * (backward) / at-or-after (forward) match, inclusive ties, null on no
  * match, left-outer row preservation — plus the plan-shape rule that
  * the whole operator is one shuffle with no join node at all. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // key 1: quotes at 10, 20, 30; key 2: one quote at 50; key 3: none
  private lazy val quotes = Seq(
    (1L, ts(10), 100.0), (1L, ts(20), 200.0), (1L, ts(30), 300.0),
    (2L, ts(50), 500.0))
    .toDF("k", "q_ts", "price")

  private lazy val trades = Seq(
    (1L, 1L, ts(5)),   // before any quote -> null
    (2L, 1L, ts(20)),  // tie -> the 20-quote (inclusive)
    (3L, 1L, ts(25)),  // between -> the 20-quote
    (4L, 1L, ts(99)),  // after all -> the 30-quote
    (5L, 2L, ts(49)),  // just before the only quote -> null
    (6L, 3L, ts(10)))  // key with no quotes -> null
    .toDF("t_id", "k", "t_ts")

  test("backward: nearest at-or-before quote, inclusive tie, null when none") {
    val got = AsofJoin.backward(trades, quotes, "k", "t_ts", "q_ts")
      .orderBy("t_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(200.0), 3L -> Some(200.0),
      4L -> Some(300.0), 5L -> None, 6L -> None))
  }

  test("forward: nearest at-or-after quote, inclusive tie") {
    val got = AsofJoin.forward(trades, quotes, "k", "t_ts", "q_ts")
      .orderBy("t_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got.toSeq == Seq(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> Some(300.0),
      4L -> None, 5L -> Some(500.0), 6L -> None))
  }

  test("matched right timestamp rides along with the payload") {
    val got = AsofJoin.backward(trades, quotes, "k", "t_ts", "q_ts")
      .filter(col("t_id") === 4L).collect().head
    assert(got.getTimestamp(got.fieldIndex("q_ts")) == ts(30))
  }

  test("all left rows are preserved (left-outer semantics)") {
    assert(AsofJoin.backward(trades, quotes, "k", "t_ts", "q_ts").count() ==
      trades.count())
  }

  test("null right-payload fields do not make the match skip to an older row") {
    val q = Seq((1L, ts(10), Some(1.0)), (1L, ts(20), Option.empty[Double]))
      .toDF("k", "q_ts", "price")
    val t = Seq((1L, 1L, ts(25))).toDF("t_id", "k", "t_ts")
    val row = AsofJoin.backward(t, q, "k", "t_ts", "q_ts").collect().head
    // the 20-row matches even though its price is null
    assert(row.getTimestamp(row.fieldIndex("q_ts")) == ts(20))
    assert(row.isNullAt(row.fieldIndex("price")))
  }

  test("null timestamps: null-ts right rows never match, null-ts left rows match nothing") {
    val q = Seq((1L, Option.empty[Timestamp], 5.0), (1L, Some(ts(10)), 100.0))
      .toDF("k", "q_ts", "price")
    val t = Seq((1L, 1L, Some(ts(5))), (2L, 1L, Option.empty[Timestamp]),
      (3L, 1L, Some(ts(20)))).toDF("t_id", "k", "t_ts")
    def prices(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("t_id").collect()
        .map(r => Option(r.get(r.fieldIndex("price"))).map(_ => r.getDouble(r.fieldIndex("price"))))
        .toSeq
    // backward: 5 has no real quote at-or-before (the null-ts one must NOT
    // stand in); the null-ts trade matches nothing; 20 sees the 10-quote
    assert(prices(AsofJoin.backward(t, q, "k", "t_ts", "q_ts")) ==
      Seq(None, None, Some(100.0)))
    // forward: 5 sees the 10-quote; null-ts trade nothing; 20 has nothing after
    assert(prices(AsofJoin.forward(t, q, "k", "t_ts", "q_ts")) ==
      Seq(Some(100.0), None, None))
  }

  test("tolerance bounds staleness: too-old matches revert to nulls") {
    // trade at 99 matched the 30-quote without tolerance; with a
    // 30-second bound that match is 69s stale -> dropped
    val got = AsofJoin.backward(trades, quotes, "k", "t_ts", "q_ts",
      tolerance = Some("30 seconds"))
      .orderBy("t_id").collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got.toSeq == Seq(
      1L -> None, 2L -> Some(200.0), 3L -> Some(200.0),
      4L -> None, 5L -> None, 6L -> None))
    // forward with a 1-second bound: only the exact tie survives
    val fwd = AsofJoin.forward(trades, quotes, "k", "t_ts", "q_ts",
      tolerance = Some("1 second"))
      .orderBy("t_id").collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(fwd.toSeq == Seq(
      1L -> None, 2L -> Some(200.0), 3L -> None,
      4L -> None, 5L -> Some(500.0), 6L -> None))
  }

  test("colliding right column names are refused") {
    val bad = quotes.withColumnRenamed("q_ts", "t_ts")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, bad, "k", "t_ts", "t_ts")
    }
  }

  test("randomized equivalence vs brute-force reference (seeded)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { round =>
      // duplicate timestamps across keys, ties between sides, multiple keys
      val qs = Seq.fill(40)((rnd.nextInt(5).toLong, ts(rnd.nextInt(50).toLong),
        rnd.nextInt(1000).toDouble))
        // unique (key, ts) per the operator contract
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      val trs = Seq.tabulate(60)(i =>
        (i.toLong, rnd.nextInt(5).toLong, ts(rnd.nextInt(50).toLong)))
      val quotesDf = qs.toDF("k", "q_ts", "price")
      val tradesDf = trs.toDF("t_id", "k", "t_ts")

      def expected(fwd: Boolean): Map[Long, Option[Double]] =
        trs.map { case (id, k, t) =>
          val cands = qs.filter(q => q._1 == k &&
            (if (fwd) !q._2.before(t) else !q._2.after(t)))
          id -> (if (cands.isEmpty) None
                 else Some((if (fwd) cands.minBy(_._2.getTime)
                            else cands.maxBy(_._2.getTime))._3))
        }.toMap

      def got(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
        df.collect().map(r => r.getLong(0) ->
          Option(r.get(r.fieldIndex("price")))
            .map(_ => r.getDouble(r.fieldIndex("price")))).toMap

      assert(got(AsofJoin.backward(tradesDf, quotesDf, "k", "t_ts", "q_ts")) ==
        expected(fwd = false), s"backward round $round")
      assert(got(AsofJoin.forward(tradesDf, quotesDf, "k", "t_ts", "q_ts")) ==
        expected(fwd = true), s"forward round $round")
    }
  }

  test("plan: no join node, no cartesian — one shuffle + window") {
    val qe = AsofJoin.backward(trades, quotes, "k", "t_ts", "q_ts").queryExecution
    val logical = qe.optimizedPlan.toString
    assert(!"\\bJoin\\b".r.findAllIn(logical).hasNext, logical)
    assert("\\bWindow\\b".r.findAllIn(logical).size == 1, logical)
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }
}
