package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_repetition(tokenHashes)` — every per-document repetition
  * signal of the Gopher quality-filter family in ONE generated pass
  * over the token-hash array: token total, distinct-token count, the
  * top token's multiplicity, bigram total and the top bigram's
  * multiplicity.
  *
  * The declarative formulation (explode → groupBy(doc, tok) →
  * groupBy(doc), twice — once for tokens, once for bigrams, then two
  * left joins back) shuffles every token occurrence of the corpus
  * three times keyed by doc id, for statistics that are all functions
  * of a single row. At 100 TB that is the difference between a
  * map-only scan and shuffling the full token explosion of the corpus.
  * This expression sorts the (per-document, so small) hash array once
  * and reads multiplicities off run lengths — zero shuffles, zero
  * explode rows, one scan of `documents`.
  *
  * Counts are BIT-IDENTICAL to the declarative version: tokens count
  * by their 64-bit hash (collisions vanish at P ≈ tokens²·2⁻⁶⁴, same
  * stance as [[graft.text.Dedup.shingleHashesFromTokenHashes]]), and
  * each bigram's key is `xxhash64(h_i, h_{i+1})` — literally the same
  * seed-42 chain Spark's `xxhash64` computes over two bigint columns,
  * so the bigram keyspace matches the old
  * `shingleHashesFromTokenHashes(th, 2)` explode byte for byte.
  * Degenerate shapes: a NULL or empty array (blank / null document)
  * yields the all-zero row the old left-join + coalesce produced; null
  * elements are skipped like explode drops nothing it can't hash
  * (unreachable from `tokenHashes`, whose inputs are filtered
  * non-empty strings).
  */
case class RepetitionStatsKernel(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_repetition"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_tok", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bg", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> token hashes, got ${t.catalogString}")
  }

  /** The whole kernel, shared verbatim by eval and the generated code
    * (the loop body is data-dependent enough that inlining it into
    * Janino source buys nothing over one virtual call per row). */
  def compute(v: Any): InternalRow = {
    val out = new Array[Any](5)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Long.valueOf(0L))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
    if (v == null) return row
    val arr = v.asInstanceOf[ArrayData]
    val n0 = arr.numElements()
    // Dense copy skipping null slots (none in practice — see Scaladoc).
    val toks = new Array[Long](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { toks(n) = arr.getLong(i); n += 1 }
      i += 1
    }
    if (n == 0) return row
    out(0) = java.lang.Long.valueOf(n.toLong)
    // Token multiplicities = run lengths of the sorted hash array.
    val sorted = java.util.Arrays.copyOf(toks, n)
    java.util.Arrays.sort(sorted)
    var distinct = 1L
    var maxTok = 1L
    var run = 1L
    i = 1
    while (i < n) {
      if (sorted(i) == sorted(i - 1)) {
        run += 1
        if (run > maxTok) maxTok = run
      } else { distinct += 1; run = 1L }
      i += 1
    }
    out(1) = java.lang.Long.valueOf(distinct)
    out(2) = java.lang.Long.valueOf(maxTok)
    if (n >= 2) {
      // Bigram keys: the seed-42 xxhash64 chain over adjacent token
      // hashes — identical to xxhash64(h_i, h_{i+1}) in SQL.
      val bg = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        bg(i) = XXH64.hashLong(toks(i + 1), XXH64.hashLong(toks(i), 42L))
        i += 1
      }
      java.util.Arrays.sort(bg)
      var maxBg = 1L
      run = 1L
      i = 1
      while (i < n - 1) {
        if (bg(i) == bg(i - 1)) {
          run += 1
          if (run > maxBg) maxBg = run
        } else run = 1L
        i += 1
      }
      out(3) = java.lang.Long.valueOf((n - 1).toLong)
      out(4) = java.lang.Long.valueOf(maxBg)
    }
    row
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("repetitionKernel", this,
      classOf[RepetitionStatsKernel].getName)
    val childNullCheck = if (child.nullable) s"${childGen.isNull}" else "false"
    val code =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = $self.compute(
          ($childNullCheck) ? null : ${childGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsKernel =
    copy(child = newChild)
}
