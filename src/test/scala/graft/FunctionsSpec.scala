package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorFunctions

/** The native codegen vector expressions (graft_dot / graft_cosine)
  * must be BIT-identical to the higher-order-function formulation they
  * replaced — the DuckDB oracle hash-compares doubles — including the
  * null/length/NaN corners, and must actually survive codegen (no
  * silent interpreted fallback). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-native formulations, kept verbatim as the semantic spec. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    def nrm(v: org.apache.spark.sql.Column) = sqrt(hofDot(v, v))
    least(greatest(hofDot(ad, bd) / (nrm(ad) * nrm(bd)), lit(-1.0)), lit(1.0))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("graft_dot and graft_cosine are bit-identical to the HOF formulation") {
    val cmp = vecs.select(
      VectorFunctions.dot(col("a"), col("b")).as("nd"),
      hofDot(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double"))).as("hd"),
      VectorFunctions.cosine(col("a"), col("b")).as("nc"),
      hofCosine(col("a"), col("b")).as("hc"))
    // exact double equality, not tolerance — the oracle hashes bits
    assert(cmp.filter(col("nd") =!= col("hd") || col("nc") =!= col("hc")).count() === 0)
  }

  test("null element, null array and length mismatch all yield NULL") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, null)),
      (2L, Seq[java.lang.Float](1f, 2f), null),
      (3L, Seq[java.lang.Float](1f, 2f, 3f), Seq[java.lang.Float](1f, 2f))
    ).toDF("id", "a", "b")
    val out = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c")).collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("zero-norm input yields NaN where ANSI-mode HOF division throws") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
    val native = df.select(VectorFunctions.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(native.isNaN)
    // the formulation this replaces cannot even evaluate the row
    val e = intercept[Exception] {
      df.select(hofCosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("functions resolve from SQL text through the FunctionRegistry") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                    array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c
        |""".stripMargin).head
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 1.0)
  }

  test("graft_minhash is bit-identical to the declarative k-pass formulation") {
    // the formulation MinHashSignature replaced, kept as the spec
    val (as, bs) = graft.functions.MinHashSignature.seeds(8)
    def hofMinhash(bh: org.apache.spark.sql.Column) =
      array((0 until 8).map { i =>
        array_min(transform(bh,
          h => (h.bitwiseAND(lit(0xffffffffL)) * lit(as(i)) + lit(bs(i)))
            % lit(graft.functions.MinHashSignature.Prime)))
      }: _*)
    val rnd = new scala.util.Random(11)
    val docs = (0 until 100).map(i => (i.toLong, Seq.fill(20)(rnd.nextLong())))
      .toDF("id", "bh")
    val native = call_function("graft_minhash", col("bh"), lit(8))
    assert(docs.filter(not(native <=> hofMinhash(col("bh")))).count() === 0)
    // degenerate inputs: empty or NULL base hashes → k NULL slots
    val deg = Seq((1L, Seq.empty[Long]), (2L, null)).toDF("id", "bh")
      .select(call_function("graft_minhash", col("bh"), lit(8)).as("sig"))
      .collect()
    assert(deg.forall(r =>
      r.getSeq[Any](0).length == 8 && r.getSeq[Any](0).forall(_ == null)))
  }

  test("graft_sig_agreement is bit-identical to the zip_with formulation") {
    def hofAgreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
        (x, y) => when(x === y, lit(1.0)).otherwise(lit(0.0))),
        lit(0.0), (acc, x) => acc + x) / size(a)
    val rnd = new scala.util.Random(23)
    val sigs = (0 until 200).map { i =>
      val a = Seq.fill(64)(rnd.nextInt(8).toLong) // small range → real overlaps
      val b = if (i % 3 == 0) a else Seq.fill(64)(rnd.nextInt(8).toLong)
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
    val native = call_function("graft_sig_agreement", col("a"), col("b"))
    assert(sigs.filter(not(native <=> hofAgreement(col("a"), col("b")))).count() === 0)
    // null array → NULL; null slots count as disagreement
    val deg = Seq(
      (1L, null, Seq[java.lang.Long](1L, 2L)),
      (2L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, null))
    ).toDF("id", "a", "b")
      .select(call_function("graft_sig_agreement", col("a"), col("b")).as("s"))
      .collect()
    assert(deg(0).isNullAt(0) && deg(1).getDouble(0) === 0.5)
  }

  /** Transparent reference greedy tokenizer — the semantic spec for
    * graft_subword, deliberately written the slow obvious way. */
  private def refSubword(text: String): (Long, Long) = {
    if (text == null) return (0L, 0L)
    val vocab = graft.text.TextFunctions.subwordVocab.sortBy(-_.length)
    val words = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    var toks = 0L
    words.foreach { w =>
      var i = 0
      while (i < w.length) {
        vocab.find(t => w.startsWith(t, i)) match {
          case Some(t) => i += t.length
          case None =>
            i += (if (Character.isHighSurrogate(w.charAt(i)) &&
              i + 1 < w.length &&
              Character.isLowSurrogate(w.charAt(i + 1))) 2 else 1)
        }
        toks += 1
      }
    }
    (words.length.toLong, toks)
  }

  test("graft_subword matches the reference greedy walk on edge shapes") {
    val cases = Seq(
      null, "", "   \t\n ", "the", "thethe", "xqz", "the xqz streaming",
      "windowing", "s", "  leading and trailing  ", "a b", // NBSP is NOT ws
      "prepreprocessing", "ingesting data streams",
      "a\u000Bb", // vertical tab IS RE2 \\s whitespace -> 2 words
      "\uD83Dx y", // unpaired high surrogate: 1-char fallback, x its own token
      "😀 emoji word") // surrogate pair = 1 fallback token
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
      call_function("graft_subword", col("text")).as("sw"))
      .select(col("id"), col("sw.n_words"), col("sw.n_subwords"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === refSubword(t), s"case $i: ${Option(t)}")
    }
    // and on real corpus text
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"),
        call_function("graft_subword", col("text")).as("sw"))
      .select(col("doc_id"), col("text"),
        col("sw.n_words"), col("sw.n_subwords")).collect()
    docs.take(50).foreach { r =>
      assert((r.getLong(2), r.getLong(3)) === refSubword(r.getString(1)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("expressions survive codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = vecs.select(
        sum(VectorFunctions.dot(col("a"), col("b"))).as("sd"),
        sum(VectorFunctions.cosine(col("a"), col("b"))).as("sc")).head
      assert(!s.isNullAt(0) && !s.isNullAt(1))
      val m = Seq((1L, Seq(3L, 9L, 27L))).toDF("id", "bh")
        .select(call_function("graft_minhash", col("bh"), lit(16)).as("sig"))
        .select(col("sig"),
          call_function("graft_sig_agreement", col("sig"), col("sig")).as("agree"))
        .head
      assert(m.getSeq[Long](0).length == 16 && m.getDouble(1) === 1.0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("graft_bytehist is bit-identical to the per-byte explode form") {
    // edge shapes: empty payload, single byte, bucket-boundary bytes
    // (0x00, 0x03/0x04 at width 4, 0xff), multi-byte utf-8 (buckets the
    // ENCODED bytes, not code points), plus random binary
    val rnd = new scala.util.Random(11)
    val docs = (0L until 60L).map { i =>
      val payload: Array[Byte] = i match {
        case 0 => Array.emptyByteArray
        case 1 => Array(0x00.toByte)
        case 2 => Array(0x03.toByte, 0x04.toByte, 0xff.toByte)
        case 3 => "héllo — ünïcode ✓".getBytes("UTF-8")
        case _ => Array.fill((rnd.nextInt(400) + 1))(rnd.nextInt(256).toByte)
      }
      (i, payload)
    }.toDF("doc_id", "payload")
    for (buckets <- Seq(16, 64)) {
      val kernel = graft.multimodal.Binary.byteHistogram(docs, buckets)
      val explode = graft.multimodal.Binary.byteHistogramExplode(docs, buckets)
      assert(kernel.exceptAll(explode).isEmpty && explode.exceptAll(kernel).isEmpty,
        s"kernel vs explode divergence at buckets=$buckets")
    }
    // the kernel itself: empty payload -> all-zero vector; null -> zeros
    val v = docs.filter(col("doc_id") === 0)
      .select(call_function("graft_bytehist", col("payload"), lit(16)).as("v"))
      .head.getSeq[Long](0)
    assert(v.length == 16 && v.forall(_ == 0L))
    val vn = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(call_function("graft_bytehist", col("payload"), lit(16)).as("v"))
      .head.getSeq[Long](0)
    assert(vn.length == 16 && vn.forall(_ == 0L))
  }

  test("round-8 functions resolve from SQL text and reject misuse at analysis") {
    // SQL-text resolution (the FunctionRegistry path, not call_function)
    Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 5L, "b"))
      .toDF("id", "v", "t").createOrReplaceTempView("f8")
    val tk = spark.sql(
      "SELECT graft_topk(v, id, 2) AS top FROM f8").head.getSeq[Any](0)
    assert(tk.length == 2)
    val hh = spark.sql(
      "SELECT graft_heavyhitters(t, 4) AS hh FROM f8").head.getSeq[Any](0)
    assert(hh.length == 2) // a, b
    // misuse fails at ANALYSIS, not at runtime: a non-foldable sketch
    // (bloom must be a plan-time constant) and a non-literal k
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_contains(encode(t, 'utf-8'), t) FROM f8").head
    }
    intercept[Exception] {
      spark.sql("SELECT graft_topk(v, id, id) FROM f8").head
    }
  }

  test("graft_heavyhitters: guarantee under eviction, exact two-pass composition") {
    // planted skew over a wide tail: items 'hot0'..'hot2' take ~30% of
    // the stream, the tail is 5000 distinct singletons-ish — with
    // capacity 16 the sketch constantly evicts, and the guarantee
    // (freq > n/(cap+1) => candidate) must still hold under Spark's
    // arbitrary partial/merge order
    val hot = spark.range(6000).select(
      concat(lit("hot"), (col("id") % 3).cast("string")).as("item"))
    val tail = spark.range(14000).select(
      concat(lit("t"), (col("id") % 5000).cast("string")).as("item"))
    val stream = hot.unionByName(tail).repartition(8) // force multi-partial merges
    val cand = stream
      .agg(call_function("graft_heavyhitters", col("item"), lit(16)).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item")).as[String].collect().toSet
    // each hot item is 10% of 20000 = 2000 > 20000/17 ≈ 1176 — guaranteed
    assert(Set("hot0", "hot1", "hot2").subsetOf(cand), s"lost a guaranteed heavy item: $cand")
    assert(cand.size <= 16)
    // the exact composition returns precisely the above-bar set
    val docs = stream.groupBy((monotonically_increasing_id() % 97).as("g"))
      .agg(concat_ws(" ", collect_list(col("item"))).as("text"))
      .withColumn("doc_id", col("g"))
    val out = graft.text.CorpusStats.heavyTokens(
      docs, "doc_id", "text", capacity = 16, minFreq = 0.09)
      .select(col("tok"), col("cnt")).as[(String, Long)].collect().toMap
    assert(out.keySet == Set("hot0", "hot1", "hot2"), s"exact set wrong: $out")
    assert(out.values.toSet == Set(2000L))
  }

  test("graft_topk: total order, tie-break, k bound, null skip, merge-order independence") {
    import graft.functions.TopKAgg
    // buffer semantics straight on the data structure: insertion order
    // must never matter (partials merge in arbitrary order at scale)
    val items = Seq((5L, 10L), (9L, 1L), (5L, 2L), (9L, 7L), (1L, 99L), (7L, 3L))
    val expect = Seq((9L, 1L), (9L, 7L), (7L, 3L)) // score desc, payload asc
    for (perm <- items.permutations.take(50)) {
      val b = new TopKAgg.Buffer(3)
      perm.foreach { case (s, p) => b.offer(s, p) }
      val got = (0 until b.size).map(i => (b.scores(i), b.payloads(i)))
      assert(got == expect, s"order-dependent result for $perm")
    }
    // end-to-end through SQL with nulls and groups: nulls skipped,
    // short groups emit what they have
    val df = Seq(
      (1, Some(5L), Some(10L)), (1, Some(9L), Some(1L)), (1, None, Some(2L)),
      (1, Some(9L), None), (2, Some(4L), Some(4L)))
      .toDF("g", "s", "p")
    val rows = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("p"), lit(2)).as("top"))
      .orderBy(col("g"))
      .select(col("top").cast("array<struct<score:long,payload:long>>"))
      .as[Seq[(Long, Long)]].collect()
    assert(rows(0) == Seq((9L, 1L), (5L, 10L)))
    assert(rows(1) == Seq((4L, 4L)))
  }
  test("graft_nfc composes decomposed text, is idempotent, and survives codegen") {
    // decomposed (base + combining mark) -> composed single code point;
    // the expected strings are built from explicit code points so the
    // test cannot depend on this FILE's own normalization form
    val acute = "\u0301"; val ring = "\u030a"
    val rows = Seq(
      (1L, "cafe" + acute),                // e + combining acute -> \u00e9
      (2L, "A" + ring),                    // A + combining ring -> \u00c5
      (3L, "plain ascii stays untouched"),
      (4L, "caf\u00e9"),                   // already NFC: fast path
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    def run() = rows
      .select(col("id"), call_function("graft_nfc", col("t")).as("n"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = Array(
      1L -> "caf\u00e9", 2L -> "\u00c5",
      3L -> "plain ascii stays untouched", 4L -> "caf\u00e9", 5L -> null)
    // codegen path AND the interpreted fallback must agree exactly
    val got = run()
    assert(got.sameElements(expected), got.mkString(", "))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run().sameElements(expected))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // idempotence: NFC(NFC(x)) == NFC(x), and SQL-text resolution works
    rows.filter(col("t").isNotNull).createOrReplaceTempView("nfc_in")
    val twice = spark.sql(
      "SELECT sum(CASE WHEN graft_nfc(graft_nfc(t)) = graft_nfc(t) " +
        "THEN 0 ELSE 1 END) AS bad FROM nfc_in").head.getLong(0)
    assert(twice == 0L)
    // misuse is an analysis error, not a runtime one
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_nfc(42)").collect()
    }
  }
}
