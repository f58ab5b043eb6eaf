package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Classifier

/** The in-engine NB quality classifier: exact-zero model on a
  * symmetric corpus (every term hand-checkable), separation on a
  * planted lexical signal, and partitioning invariance of the integer
  * margins. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("symmetric classes train the exact-zero model: every margin is 0") {
    // Identical text and equal doc counts per class → C1j = C0j and
    // T1 = T0, so every weight is floor(1e6·(ln p − ln p)) = 0, and the
    // prior is floor(1e6·ln(2/2)) = 0: margins must be EXACTLY zero.
    val docs = Seq((0L, 1, "a b c"), (1L, 1, "a b c"),
      (2L, 0, "a b c"), (3L, 0, "a b c")).toDF("id", "y", "text")
    val m = Classifier.scored(docs, "id", "text", col("y") === 1)
      .select(col("id"), col("mq")).collect()
    assert(m.length == 4 && m.forall(_.getLong(1) == 0L))
  }

  test("planted signal separates: min positive avg margin > max negative") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 40L).map { i =>
      val y = if (i < 8) 1 else 0
      val text = if (y == 1) s"$common goodmark goodmark" else common + s" filler$i"
      (i, y, text)
    }.toDF("id", "y", "text")
    val scored = Classifier.scored(docs, "id", "text", col("y") === 1)
      .select(col("id"), col("y"), Classifier.avgMargin.as("am")).collect()
    val pos = scored.filter(_.getLong(1) == 1).map(_.getDouble(2))
    val neg = scored.filter(_.getLong(1) == 0).map(_.getDouble(2))
    assert(pos.min > neg.max,
      s"no separation: pos min ${pos.min} vs neg max ${neg.max}")
  }

  test("margins are partitioning-invariant (exact integers)") {
    val docs = (0L until 30L)
      .map(i => (i, i % 3, s"tok$i alpha beta common${i % 5} gamma"))
      .toDF("id", "y", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Classifier.scored(df, "id", "text", col("y") === 1L)
        .select(col("id"), col("mq")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("multiclass NB: held-out docs route to the class whose signal they carry") {
    val mk = Map(0L -> "aa bb", 1L -> "cc dd", 2L -> "ee ff")
    val train = (0L until 30L)
      .map(i => (i, s"cls${i % 3}", s"common filler words here ${mk(i % 3)}"))
      .toDF("id", "cls", "text")
    val test = Seq((100L, "cls1", "common filler words here cc dd"),
      (101L, "cls2", "common filler words here ee ff"))
      .toDF("id", "cls", "text")
    val p = Classifier.multiclassPredictions(train, test, "id", "text", "cls")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(p == Map(100L -> "cls1", 101L -> "cls2"))
  }

  test("multiclass NB under class imbalance: shared vocabulary is not evidence") {
    // 24 docs of the big class vs 3 of the small one, all sharing the
    // same base text; the held-out doc carries ONLY the small class's
    // marker. Add-one smoothing turns every shared token into big-class
    // evidence (the (C+1)/(T+B) deflation); the Lidstone default must
    // not.
    val train = ((0L until 24L).map(i => (i, "big", s"common base words t$i"))
      ++ (24L until 27L).map(i => (i, "small", s"common base words mk")))
      .toDF("id", "cls", "text")
    val test = Seq((100L, "small", "common base words mk")).toDF("id", "cls", "text")
    val p = Classifier.multiclassPredictions(train, test, "id", "text", "cls")
      .collect()
    assert(p.length == 1 && p(0).getString(2) == "small", p.mkString)
  }

  test("fit + scoreWith reproduce scored's margins on the training corpus") {
    // the fused train-and-score path and the persisted-model serving
    // path are the same model — every margin must agree exactly
    val docs = (0L until 30L)
      .map(i => (i, (i % 3).min(1), s"tok$i alpha beta common${i % 5}"))
      .toDF("id", "y", "text")
    val fused = Classifier.scored(docs, "id", "text", col("y") === 1)
      .select(col("id"), col("mq"), col("n_tok")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val model = Classifier.fit(docs, "id", "text", col("y") === 1)
    val served = Classifier.scoreWith(docs, "id", "text", model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fused == served)
  }

  test("unseen tokens score at the model's floor weight, not zero") {
    // buckets must dwarf the vocabulary: md5 buckets of aa/bb/zz at
    // 4096 are 3111/208/183 — collision-free (at 16 they are not, and
    // "zz" lands in "aa"'s bucket)
    val train = Seq((0L, 1, "aa aa aa"), (1L, 0, "bb")).toDF("id", "y", "text")
    val model = Classifier.fit(train, "id", "text", col("y") === 1)
    val fq = model.filter(col("j") === -2L).head().getLong(1)
    // t1 = 3, t0 = 1 → floor = ln(4097/4099)·1e6 < 0 (an unseen token
    // is mild evidence AGAINST the class with more observed mass)
    assert(fq < 0, s"fq = $fq")
    // prior is ln(1/1) = 0, so a fully-unseen doc's margin IS the floor
    val sw = Classifier.scoreWith(
      Seq((9L, "zz")).toDF("id", "text"), "id", "text", model)
      .head()
    assert(sw.getLong(1) == fq && sw.getLong(2) == 1L, sw.toString)
  }

  test("token-less documents are outside the model") {
    val docs = Seq((0L, 1, "alpha beta"), (1L, 0, "gamma"), (2L, 0, "  "))
      .toDF("id", "y", "text")
    val ids = Classifier.scored(docs, "id", "text", col("y") === 1)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L))
  }

  test("histogram AUC agrees with the exact midrank AUC within in-bucket tie mass") {
    // a mixed-margin relation with overlap between the classes (AUC
    // well inside (0.5, 1)) plus engineered cross-class in-bucket
    // collisions; the histogram estimator at 1e-4 resolution must land
    // within one bucket's tie mass of the exact Mann-Whitney value
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      val y = i % 2
      // positives shifted up but overlapping; n_tok varies so the
      // margin division exercises non-integer buckets
      val mq = (if (y == 1) 1500000L else 900000L) + rnd.nextInt(1200000).toLong
      (y.toLong, mq, 7L + (i % 13))
    }
    val df = rows.toDF("y", "mq", "n_tok")
    val got = Classifier.histAuc(df).head()
    // exact midrank AUC on the same margins, computed directly
    val ms = rows.map { case (y, mq, n) => (y, mq.toDouble / n) }
    val sorted = ms.sortBy(_._2)
    // .toSeq BEFORE flatMap: flatMapping a Map with pair results
    // rebuilds a Map keyed on y, silently collapsing the rank list
    val ranks = sorted.zipWithIndex.groupBy(_._1._2).toSeq
      .flatMap { case (_, g) =>
        val mid = g.map(_._2 + 1).sum.toDouble / g.size
        g.map { case ((y, _), _) => (y, mid) }
      }
    val n1 = ms.count(_._1 == 1L).toDouble
    val n0 = ms.size - n1
    val exact = (ranks.filter(_._1 == 1L).map(_._2).sum - n1 * (n1 + 1) / 2) /
      (n1 * n0)
    assert(got.getLong(0) == n1.toLong && got.getLong(1) == n0.toLong)
    val hist = got.getDouble(2)
    assert(math.abs(hist - exact) < 0.005,
      s"hist=$hist exact=$exact")
    assert(hist > 0.55 && hist < 0.95, s"degenerate fixture: $hist")
  }

  test("q_curation_v3 timed variant: approx-threshold survivors track the exact top-30% gate") {
    // the Q contract: a benchFn is the same operator minus the oracle
    // scaffolding, asserted by a spec. The timed curation plan swaps
    // the exact corpus-wide rank gate (top 30% by margin) for an
    // approx_percentile(am, 0.7) threshold — at accuracy 10000 over a
    // corpus-sized margin relation the two survivor sets must agree up
    // to the estimator's rank error, so the emitted row SETS must stay
    // near-identical (same schema, high overlap, close counts); exact
    // equality is NOT promised — that is precisely the trade the
    // adjudicated q_classifier_filter_approx pattern makes.
    val fn = SparkEntry.queries("q_curation_v3")(spark, TestSpark.sf)
    val timed = graft.queries.Registry
      .benchQueries("q_curation_v3")(spark, TestSpark.sf)
    assert(fn.schema == timed.schema,
      s"schema drift: ${fn.schema} vs ${timed.schema}")
    val a = fn.collect().map(_.toSeq).toSet
    val b = timed.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && b.nonEmpty)
    val overlap = (a intersect b).size.toDouble / (a union b).size
    assert(overlap >= 0.9,
      s"survivor sets diverged: jaccard=$overlap |fn|=${a.size} |timed|=${b.size}")
    val rel = math.abs(a.size - b.size).toDouble / a.size
    assert(rel <= 0.1,
      s"survivor counts diverged: |fn|=${a.size} |timed|=${b.size}")
  }
}
