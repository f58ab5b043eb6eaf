package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** `graft_bytehist(payload, buckets)` — the fixed-width byte-value
  * histogram of a binary payload as ONE generated pass: a
  * `buckets`-length `array<bigint>` of counts, bucket `b` counting
  * bytes in `[b·(256/buckets), (b+1)·(256/buckets))`.
  *
  * This is the per-row kernel every media featurizer has (payload in,
  * fixed-width vector out) and the hot map stage of the multimodal
  * family. The declarative form (hex → per-byte `transform` +
  * `explode` → groupBy(doc, bucket)) materializes one ROW PER BYTE and
  * shuffles the full byte explosion of the corpus keyed by doc id —
  * for a statistic that is a function of a single row. At 100 TB of
  * payloads that is the difference between a map-only projection and
  * shuffling ~100 TB of explode rows. Counts are bit-identical to the
  * explode form (FunctionsSpec pins the equality); a NULL payload
  * yields the all-zero vector, which the long-format adapter
  * ([[graft.multimodal.Binary.byteHistogram]]) filters out exactly
  * like the old `CASE WHEN n > 0` gate dropped empty payloads.
  */
case class ByteHistogramKernel(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0 && 256 % buckets == 0,
    s"256 must divide into $buckets buckets")

  override def prettyName: String = "graft_bytehist"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary column, got ${t.catalogString}")
  }

  /** Shared by eval and the generated code (one virtual call per row —
    * the loop is a straight byte scan, nothing for Janino to fuse). */
  def compute(v: Any): UnsafeArrayData = {
    val counts = new Array[Long](buckets)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      val width = 256 / buckets
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) / width) += 1L
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("byteHistKernel", this,
      classOf[ByteHistogramKernel].getName)
    val childNullCheck = if (child.nullable) s"${childGen.isNull}" else "false"
    val code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData ${ev.value} =
          $self.compute(($childNullCheck) ? null : ${childGen.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogramKernel =
    copy(child = newChild)
}
