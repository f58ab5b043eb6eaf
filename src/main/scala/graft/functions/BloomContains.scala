package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(sketchBytes, value)` — membership probe of a
  * string against a serialized [[BloomFilter]] sketch.
  *
  * The sketch arrives as a foldable BINARY literal, so it rides the
  * plan and reaches every executor through Spark's own task-binary
  * broadcast — no join, no shuffle, no per-row driver traffic. The
  * deserialized filter is built once per expression instance
  * (`@transient lazy`) and shared by the generated code via a plan
  * reference object, exactly how a broadcast model table (see
  * [[SubwordTokenCount]]) is carried.
  *
  * Probe semantics match the builder: `DataFrameStatFunctions
  * .bloomFilter` on a string column inserts UTF-8 bytes
  * (`putString`), and this probe hashes `UTF8String.getBytes` — the
  * same bytes — so a value inserted on the build side can NEVER probe
  * false (no false negatives); false positives occur at the sketch's
  * configured fpp. NULL value probes NULL.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) if left.foldable => TypeCheckResult.TypeCheckSuccess
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a foldable (literal) sketch — the filter is a " +
        "plan-time constant, not a per-row value")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary sketch, string value), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: sketch bytes must not be NULL")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null
    else filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    val valueGen = right.genCode(ctx)
    val code =
      code"""
        ${valueGen.code}
        boolean ${ev.isNull} = ${valueGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bloomRef.mightContainBinary(${valueGen.value}.getBytes());
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
