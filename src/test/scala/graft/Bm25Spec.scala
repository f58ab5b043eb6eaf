package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bm25

/** BM25 serve-path equivalence: the persisted-index form must be
  * row-identical to the inline corpus-scan form — including the
  * degenerate under-k case, where the index path pads with the same
  * 0.0-score documents the inline ranking carries natively. */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def indexed(docs: org.apache.spark.sql.DataFrame,
                      terms: Seq[String], k: Int) = {
    val (postings, doclen, stats) = Bm25.buildIndex(docs, "doc_id", "text")
    Bm25.topDocsIndexed(
      graft.plans.Materialize.stage(postings),
      graft.plans.Materialize.stage(doclen),
      graft.plans.Materialize.stage(stats), "doc_id", terms, k)
  }

  test("indexed serve equals inline serve on the real corpus") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val terms = Seq("spark", "stream", "merge", "window")
    val inline = Bm25.topDocs(docs, "doc_id", "text", terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = indexed(docs, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == idx)
  }

  test("under-k case: indexed serve pads with the inline path's 0.0-score ranking") {
    // only docs 2 and 5 match; k = 4 forces two 0.0-score pads, which
    // the inline path orders by id — the indexed path must land on the
    // identical four rows in the identical order
    val docs = Seq(
      (7L, "nothing relevant here at all"),
      (2L, "alpha beta alpha"),
      (5L, "alpha gamma"),
      (1L, "unrelated filler words"),
      (9L, "more unrelated filler")).toDF("doc_id", "text")
    val inline = Bm25.topDocs(docs, "doc_id", "text", Seq("alpha"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = indexed(docs, Seq("alpha"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == idx, s"inline $inline vs indexed $idx")
    assert(inline.map(_._1) == Seq(2L, 5L, 1L, 7L), inline)
    assert(inline.drop(2).forall(_._2 == 0.0), inline)
  }

  test("rounds-to-zero tie: indexed serve matches inline when every matched score rounds to 0.0000") {
    // a near-ubiquitous term (idf ≈ 1.5/40000) scores ~4e-5 per matched
    // doc → 0.0000 after the 4-decimal rounding, so the inline path's
    // (score desc, id) ranking ties matched docs WITH the unmatched doc
    // 0 at 0.0 and breaks by id — doc 0 (unmatched!) wins. The indexed
    // path's nMatched >= k branch alone would return matched docs only;
    // the min-rounded-score probe must detect the tie and take the pad
    // union.
    val n = 40000L
    val docs = spark.range(1L, n + 1L)
      .select(col("id").as("doc_id"), lit("zz").as("text"))
      .unionByName(Seq((0L, "aa bb")).toDF("doc_id", "text"))
    val inline = Bm25.topDocs(docs, "doc_id", "text", Seq("zz"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = indexed(docs, Seq("zz"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == idx, s"inline $inline vs indexed $idx")
    assert(inline.map(_._1) == Seq(0L, 1L, 2L), inline)
    assert(inline.forall(_._2 == 0.0), inline)
  }
}
