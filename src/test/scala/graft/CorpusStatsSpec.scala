package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Sampling
import graft.text.{CorpusStats, Decontaminate}

/** Corpus-curation operators on hand-built fixtures where every number
  * is checkable by eye, plus the plan-shape guarantees that make them
  * viable at corpus scale (broadcast probes, no cartesian products). */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a a a b"),           // 4 tokens, 2 distinct, top share 3/4
    (1L, "x y z w v"),         // all distinct
    (2L, "p p p p"),           // fully repeated
    (3L, "one two")            // too short for most n-grams
  ).toDF("doc_id", "text")

  test("repetition stats: hand-checked ratios") {
    val r = CorpusStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 0: ttr 2/4, top token 3/4, bigrams: "a a"×2, "a b"×1 → 2/3
    assert(r(0).getLong(1) == 4 && r(0).getLong(2) == 2)
    assert(r(0).getDouble(3) == 0.5 && r(0).getDouble(4) == 0.75)
    assert(r(0).getDouble(5) == 0.6667)
    // doc 1: everything distinct
    assert(r(1).getDouble(3) == 1.0 && r(1).getDouble(4) == 0.2)
    // doc 2: one token type
    assert(r(2).getDouble(3) == 0.25 && r(2).getDouble(4) == 1.0 &&
      r(2).getDouble(5) == 1.0)
  }

  test("token entropy: 0 for single-type docs, ln k for uniform docs") {
    val e = CorpusStats.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(e(2).getDouble(2) == 0.0) // p p p p → H = 0
    // doc 1: uniform over 5 → ln 5 ≈ 1.6094
    assert(math.abs(e(1).getDouble(2) - math.log(5.0)) < 1e-3, e(1))
    // doc 3: uniform over 2 → ln 2 ≈ 0.6931
    assert(math.abs(e(3).getDouble(2) - math.log(2.0)) < 1e-3, e(3))
  }

  test("oov rate: tokens outside the top-v vocabulary are counted") {
    // v=1 → vocab = most frequent token overall: "p" (4 occurrences)
    val o = CorpusStats.oovRate(docs, "doc_id", "text", v = 1)
      .orderBy("doc_id").collect()
    assert(o(2).getLong(2) == 0 && o(2).getDouble(3) == 0.0) // all in vocab
    assert(o(1).getLong(2) == 5 && o(1).getDouble(3) == 1.0) // none in vocab
  }

  test("boilerplate ratio: planted frequent phrase is flagged") {
    val corpus = spark.range(30)
      .select(col("id").as("doc_id"),
        concat(lit("common phrase here unique"), col("id")).as("text"))
    val b = CorpusStats.boilerplateRatio(corpus, "doc_id", "text",
      n = 2, minDf = 30).orderBy("doc_id").collect()
    // grams per doc: "common phrase"(30 docs), "phrase here"(30),
    // "here uniqueN"(1) → 2 of 3 boilerplate
    assert(b(0).getLong(1) == 3 && b(0).getLong(2) == 2)
    assert(b(0).getDouble(3) == 0.6667)
  }

  test("decontamination: planted overlap flagged, short docs never match") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "totally unrelated content with different words entirely"),
      (12L, "quick brown fox")
    ).toDF("doc_id", "text") // doc 12 is shorter than the 5-gram window
    val eval = Seq((90L, "we saw the quick brown fox jumps over a fence"))
      .toDF("doc_id", "text")
    val r = Decontaminate.overlap(corpus, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) > 0 && r(0).getInt(2) == 1, r(0))
    assert(r(1).getLong(1) == 0 && r(1).getInt(2) == 0)
    assert(r(2).getLong(1) == 0 && r(2).getInt(2) == 0)
  }

  test("plan: decontamination probe broadcasts the eval side, no cartesian") {
    val corpus = docs
    val eval = Seq((90L, "a a a b c d e f")).toDF("doc_id", "text")
    val plan = Decontaminate.overlap(corpus, eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bigram LM score: hand-computed smoothing, predictable text scores higher, short docs 0") {
    // corpus: "a b" ×3 and "a c" ×1 → C(a,b)=3, C(a,c)=1, C(a)=4, and
    // V=4 (a, b, c, solo — the bigram-less doc still contributes vocab)
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "solo")) // 1 token → no bigrams
      .toDF("doc_id", "text")
    val r = CorpusStats.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def term(cbg: Long, cw1: Long, v: Long): Double =
      math.floor(1e6 * math.log((cbg + 1.0) / (cw1 + v.toDouble))) / 1e6
    // doc 1-3: one bigram (a,b): ln(4/8); doc 4: ln(2/8)
    val ab = BigDecimal(term(3, 4, 4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ac = BigDecimal(term(1, 4, 4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getLong(1) == 1 && r(0).getDouble(2) == ab, r(0))
    assert(r(3).getLong(1) == 1 && r(3).getDouble(2) == ac, r(3))
    assert(ab > ac) // the common continuation scores higher
    assert(r(4).getLong(1) == 0 && r(4).getDouble(2) == 0.0)
  }

  test("cross-scoring LM: unseen bigrams smooth to the floor, never vanish; self-scoring reduces exactly") {
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text") // C(a,b)=2, C(a,c)=1, C(a)=3, V=3
    // scorer doc 10: bigram (a,b) seen; doc 11: entirely out-of-train
    // vocab — both its bigrams must smooth to ln(1/(0+V)), not drop
    val score = Seq((10L, "a b"), (11L, "x y z")).toDF("doc_id", "text")
    val r = CorpusStats.bigramLogProbAgainst(train, score, "doc_id", "text")
      .orderBy("doc_id").collect()
    def term(cbg: Long, cw1: Long, v: Long): Double =
      math.floor(1e6 * math.log((cbg + 1.0) / (cw1 + v.toDouble))) / 1e6
    def r4(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getLong(1) == 1 && r(0).getDouble(2) == r4(term(2, 3, 3)), r(0))
    assert(r(1).getLong(1) == 2 && r(1).getDouble(2) == r4(term(0, 0, 3)), r(1))
    // and the self-scoring special case is bit-identical through the
    // generalized path (left joins always hit)
    val self = CorpusStats.bigramLogProb(train, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(self(0).getDouble(2) == r4(term(2, 3, 3)), self(0))
  }

  test("per-stratum cap keeps exactly cap rows per stratum, deterministically") {
    val rows = spark.range(100)
      .select(col("id").as("doc_id"), (col("id") % 4).cast("string").as("src"))
    val capped = Sampling.capPerStratum(rows, "src", "doc_id", cap = 7)
    val kept = capped.filter(col("kept") === 1)
      .groupBy("src").count().collect().map(_.getLong(1))
    assert(kept.length == 4 && kept.forall(_ == 7L))
    // deterministic: the kept set is the 7 smallest ids per stratum
    val keptIds = capped.filter(col("kept") === 1 && col("src") === "0")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keptIds.sameElements(Array(0L, 4L, 8L, 12L, 16L, 20L, 24L)))
  }
}
