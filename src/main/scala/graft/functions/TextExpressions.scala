package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Registry entries for the text/dedup native expressions. */
object TextExpressions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        (args: Seq[Expression]) => args match {
          case Seq(bh) => MinHashSignature(bh, 64)
          case Seq(bh, Literal(k: Int, IntegerType)) => MinHashSignature(bh, k)
          case _ => throw new IllegalArgumentException(
            "graft_minhash expects (baseHashes array<bigint>[, k integer literal])")
        }),
      (FunctionIdentifier("graft_sig_agreement"),
        new ExpressionInfo(classOf[SignatureAgreement].getName, "graft_sig_agreement"),
        (args: Seq[Expression]) => args match {
          case Seq(a, b) => SignatureAgreement(a, b)
          case _ => throw new IllegalArgumentException(
            "graft_sig_agreement expects (sigA array<bigint>, sigB array<bigint>)")
        }),
      (FunctionIdentifier("graft_repetition"),
        new ExpressionInfo(classOf[RepetitionStatsKernel].getName, "graft_repetition"),
        (args: Seq[Expression]) => args match {
          case Seq(th) => RepetitionStatsKernel(th)
          case _ => throw new IllegalArgumentException(
            "graft_repetition expects (tokenHashes array<bigint>)")
        }),
      (FunctionIdentifier("graft_heavyhitters"),
        new ExpressionInfo(classOf[HeavyHittersAgg].getName, "graft_heavyhitters"),
        (args: Seq[Expression]) => args match {
          case Seq(item, Literal(cap: Int, IntegerType)) =>
            HeavyHittersAgg(item, cap)
          case _ => throw new IllegalArgumentException(
            "graft_heavyhitters expects (item string, capacity integer literal)")
        }),
      (FunctionIdentifier("graft_topk"),
        new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
        (args: Seq[Expression]) => args match {
          case Seq(score, payload, Literal(k: Int, IntegerType)) =>
            TopKAgg(score, payload, k)
          case _ => throw new IllegalArgumentException(
            "graft_topk expects (score bigint, payload bigint, k integer literal)")
        }),
      (FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
        (args: Seq[Expression]) => args match {
          case Seq(sketch, value) => BloomContains(sketch, value)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_contains expects (sketch binary literal, value string)")
        }),
      (FunctionIdentifier("graft_bytehist"),
        new ExpressionInfo(classOf[ByteHistogramKernel].getName, "graft_bytehist"),
        (args: Seq[Expression]) => args match {
          case Seq(payload) => ByteHistogramKernel(payload, 16)
          case Seq(payload, Literal(b: Int, IntegerType)) =>
            ByteHistogramKernel(payload, b)
          case _ => throw new IllegalArgumentException(
            "graft_bytehist expects (payload binary[, buckets integer literal])")
        }),
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (args: Seq[Expression]) => args match {
          case Seq(text) => NfcNormalize(text)
          case _ => throw new IllegalArgumentException(
            "graft_nfc expects (text string)")
        }),
      (FunctionIdentifier("graft_subword"),
        new ExpressionInfo(classOf[SubwordTokenCount].getName, "graft_subword"),
        (args: Seq[Expression]) => args match {
          // the vocab is the engine's canonical merge table, not a per-
          // call argument — one definition shared with the SQL oracle
          case Seq(text) =>
            SubwordTokenCount(text, graft.text.TextFunctions.subwordVocab)
          case _ => throw new IllegalArgumentException(
            "graft_subword expects (text string)")
        }))
}
