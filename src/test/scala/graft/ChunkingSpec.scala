package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Chunking, TextFunctions}

/** Chunking invariants (windows tile the document, overlap is exact,
  * short docs pass through) and the PII scrub on hand-built fixtures. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunks tile the document: stripping the overlap reconstructs it") {
    val df = Seq((1L, doc(200))).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, "doc_id", "text", budget = 64, overlap = 16)
      .orderBy("chunk_index").collect()
    val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getString(2).split(" ")
      if (i == 0) toks else toks.drop(16)
    }
    assert(rebuilt.mkString(" ") == doc(200))
    // every chunk is full except the last
    val sizes = chunks.map(_.getInt(3))
    assert(sizes.init.forall(_ == 64) && sizes.last <= 64)
  }

  test("consecutive chunks share exactly the overlap") {
    val df = Seq((1L, doc(150))).toDF("doc_id", "text")
    val texts = Chunking.chunk(df, "doc_id", "text", budget = 50, overlap = 10)
      .orderBy("chunk_index").collect().map(_.getString(2))
    texts.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.split(" ").takeRight(10).toSeq == b.split(" ").take(10).toSeq)
      case _ =>
    }
  }

  test("a document at or under the budget yields one identical chunk") {
    val df = Seq((1L, doc(30)), (2L, doc(64))).toDF("doc_id", "text")
    val got = Chunking.chunk(df, "doc_id", "text", budget = 64, overlap = 16)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == doc(30) && got(2L) == doc(64))
  }

  test("chunking plan has no exchange (row-parallel explode)") {
    val df = Seq((1L, doc(100))).toDF("doc_id", "text")
    val plan = Chunking.chunk(df, "doc_id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("scrubPII masks email, IP and phone; counts them; leaves clean text alone") {
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.org today"),
      (2L, "server at 10.0.42.7 answered"),
      (3L, "call +1 555-010-9999 now"),
      (4L, "a perfectly clean sentence"),
      // a pre-existing literal sentinel is NOT counted as masked PII
      (5L, "fill in <EMAIL> here"))
      .toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.scrubPII(col("text")).as("s"),
      TextFunctions.piiCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got.contains((1L, "write to <EMAIL> today", 1)))
    assert(got.contains((2L, "server at <IP> answered", 1)))
    assert(got.contains((3L, "call <PHONE> now", 1)))
    assert(got.contains((4L, "a perfectly clean sentence", 0)))
    assert(got.contains((5L, "fill in <EMAIL> here", 0)))
  }

  test("phone masking is documented-aggressive: long benign digit runs mask too") {
    val df = Seq((1L, "revenue grew 2020-2021 strongly")).toDF("id", "text")
    val s = df.select(TextFunctions.scrubPII(col("text"))).collect().head.getString(0)
    assert(s == "revenue grew <PHONE> strongly") // the accepted over-masking trade
  }
}
