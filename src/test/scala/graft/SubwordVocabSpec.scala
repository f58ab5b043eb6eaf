package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordTokenCount
import graft.text.SubwordVocab

/** Vocabulary induction invariants: the ranked n-gram table on a
  * hand-computable fixture, the determinism of the tie-break, and the
  * end-to-end loop — a vocab LEARNED from the corpus drives the
  * subword kernel. */
class SubwordVocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("induceNgramTable ranks by weighted positional frequency") {
    // "abab" appears 3×: bigrams per occurrence ab,ba,ab → ab:6, ba:3;
    // "abc" 1×: ab:1, bc:1 → ab:7, ba:3, bc:1; trigrams aba:3, bab:3,
    // abc:1; 4-grams abab:3. Ties (ba=bab=abab=3) break gram-asc.
    val df = Seq("abab abab abc", "abab").toDF("text")
    val got = SubwordVocab.induceNgramTable(df, "text", 6, nMin = 2, nMax = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      ("ab", 7L), ("aba", 3L), ("abab", 3L), ("ba", 3L), ("bab", 3L),
      ("abc", 1L)), got.toSeq)
  }

  test("short words contribute only the n-gram lengths they have") {
    // a 2-char word has one bigram and nothing longer; a 1-char word
    // contributes nothing at nMin=2
    val df = Seq("ab x ab").toDF("text")
    val got = SubwordVocab.induceNgramTable(df, "text", 10, nMin = 2, nMax = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("ab", 2L)), got.toSeq)
  }

  test("induced vocab drives the kernel end to end") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    // the sf0.001 fixture corpus carries ~227 distinct 2–5-grams —
    // ask under that so the size contract is exact
    val vocab = SubwordVocab.induce(docs, "text", 200)
    assert(vocab.size === 200 && vocab.distinct.size === 200)
    // learned grams are never whitespace (tokens come from \s+ split)
    assert(vocab.forall(t => t.length >= 2 && !t.exists(Character.isWhitespace)))
    val k = SubwordTokenCount(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), vocab)
    // frequent grams learned from the corpus must compress the corpus:
    // fewer subword tokens than characters-per-word baseline, at least
    // one doc where a multi-char gram actually matched
    val sample = docs.select(col("text")).limit(50).collect().map(_.getString(0))
    val (chars, subs) = sample.foldLeft((0L, 0L)) { case ((c, sws), t) =>
      val row = k.compute(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (c + t.replaceAll("\\s", "").length, sws + row.getLong(1))
    }
    assert(subs < chars, s"vocab never matched: $subs subwords vs $chars chars")
  }
}
