package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** `graft_subword(text)` — greedy longest-match subword tokenization
  * against a fixed vocabulary, in one generated pass over the string:
  * whitespace-token count plus subword-token count per document. Real
  * training pipelines budget corpora in subword tokens, not whitespace
  * words; this is the deterministic, oracle-checkable core of that
  * accounting (a DuckDB recursive CTE replays the same greedy walk).
  *
  * Semantics, chosen to be bit-identical to the SQL rewrite:
  * whitespace is the RE2 `\s` ASCII class (space, \t, \n, \v, \f, \r);
  * within a word the cursor repeatedly takes the LONGEST vocab token
  * matching at the current position (case-sensitive), falling back to a
  * single character (one code point — a surrogate pair advances as one
  * token, matching DuckDB's code-point `substr`). NULL text counts as
  * an empty document, like the oracle's LEFT JOIN + coalesce(0).
  *
  * The vocab ships inside the expression — serialized once with the
  * plan to every task like a broadcast literal, so the corpus scan
  * stays a map-only projection: no join against a vocab table, no
  * shuffle, no per-row UDF. Matching is first-char-bucketed,
  * longest-first, so each position probes only the few tokens that
  * could possibly match.
  */
case class SubwordTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(t =>
    t.nonEmpty && !t.exists(Character.isWhitespace)),
    "subword vocab tokens must be non-empty and whitespace-free")

  override def prettyName: String = "graft_subword"

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  /** Vocab bucketed by first char, longest token first, so the greedy
    * step's first hit IS the longest match. Built once per deserialized
    * expression instance (per task), not per row. */
  @transient private lazy val byFirst: Map[Char, Array[String]] =
    vocab.distinct.groupBy(_.charAt(0))
      .map { case (c, ts) => c -> ts.sortBy(-_.length).toArray }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The whole kernel, shared by eval and the generated code (same
    * stance as [[RepetitionStatsKernel]]: the loop is data-dependent
    * enough that inlining into Janino buys nothing over one virtual
    * call per row). */
  def compute(v: Any): InternalRow = {
    if (v == null)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val s = v.toString
    val len = s.length
    var i = 0
    var words = 0L
    var toks = 0L
    var inWord = false
    while (i < len) {
      val c = s.charAt(i)
      if (isWs(c)) { inWord = false; i += 1 }
      else {
        if (!inWord) { words += 1; inWord = true }
        var matched = 0
        val cands = byFirst.getOrElse(c, null)
        if (cands != null) {
          var j = 0
          while (matched == 0 && j < cands.length) {
            if (s.startsWith(cands(j), i)) matched = cands(j).length
            j += 1
          }
        }
        if (matched > 0) i += matched
        else if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) i += 2
        else i += 1
        toks += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words, toks))
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("subwordKernel", this,
      classOf[SubwordTokenCount].getName)
    val childNullCheck = if (child.nullable) s"${childGen.isNull}" else "false"
    val code =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = $self.compute(
          ($childNullCheck) ? null : ${childGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenCount =
    copy(child = newChild)
}
