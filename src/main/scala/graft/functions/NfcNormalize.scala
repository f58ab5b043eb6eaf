package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)` — Unicode NFC normalization as a native map-only
  * expression, the canonicalization pass a multi-source text corpus
  * needs BEFORE any hash-keyed operator: exact dedup, MinHash
  * shingling, containment grams and token-id lookup all key on raw
  * bytes, so the composed ("é", U+00E9) and decomposed ("e"+U+0301)
  * spellings of the same visible text otherwise land in different
  * buckets and silently miss every duplicate/containment pair across
  * sources that disagree on normalization form (classic with OCR and
  * macOS-originated uploads, which emit NFD).
  *
  * Scale shape: per-row, no shuffle, stays inside whole-stage codegen
  * (one virtual call per row, same pattern as [[ByteHistogramKernel]]).
  * The dominant corpus case — text already in NFC, true of all ASCII —
  * is a no-allocation `Normalizer.isNormalized` scan that returns the
  * input UTF8String unchanged; only rows that actually need composing
  * pay the String round-trip. NFC is frozen by the Unicode stability
  * policy (composition mappings are immutable since 4.1), so the JVM
  * and ICU (DuckDB's `nfc_normalize`, the oracle) agree bit-for-bit.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  /** Shared by eval and the generated code. Null-preserving (handled
    * by the UnaryExpression null gate before this is called). */
  def compute(v: Any): UTF8String = {
    val u = v.asInstanceOf[UTF8String]
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcKernel", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
