package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-vector hot path.
  *
  * The ANN/near-dup operators score one cosine or dot product per
  * candidate MEETING — O(corpus × bucket occupancy × probes) evaluations
  * — so per-evaluation cost dominates the whole module. The
  * `zip_with`/`aggregate` higher-order-function formulation is
  * declarative but evaluates interpreted (one lambda dispatch and boxed
  * intermediate per element, no whole-stage codegen); these expressions
  * generate a tight primitive loop via `doGenCode` instead, keeping the
  * surrounding plan inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF versions they replace (the
  * DuckDB oracle hash-compares doubles, so this is load-bearing):
  *   - elements promote float→double exactly; accumulation is
  *     sequential left-to-right, matching both `aggregate(...)` and
  *     DuckDB's `list_cosine_similarity`;
  *   - arrays of different lengths yield NULL (zip_with pads the short
  *     side with nulls, poisoning the sum) and so does any NULL element;
  *   - [[CosineSimilarity]] clamps finite results like
  *     `least(greatest(c, -1), 1)`. A zero-norm input yields NaN
  *     (cosine is undefined there) — a deliberate improvement over the
  *     HOF formulation, whose `Divide` throws DIVIDE_BY_ZERO under
  *     Spark 4 ANSI mode before any clamp runs.
  */
object VectorExpressions {

  /** (name, class, builder) for every function this module exports. */
  private val specs: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      args => { requireArgs("graft_dot", 2, args); DotProduct(args(0), args(1)) }),
    ("graft_cosine", classOf[CosineSimilarity],
      args => { requireArgs("graft_cosine", 2, args); CosineSimilarity(args(0), args(1)) }))

  private def requireArgs(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    specs.map { case (name, cls, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
    }

  /** Element type of a float/double array child, or None if invalid. */
  private[functions] def vecElem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  private[functions] def checkVecArgs(fn: String, exprs: Expression*): TypeCheckResult =
    exprs.find(e => vecElem(e).isEmpty) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<float> or array<double> arguments, got ${bad.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** Shared shape of the two binary vector expressions: both consume two
  * float/double arrays and emit a double computed by a single
  * generated loop. Subclasses supply the loop body and epilogue. */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVecArgs(prettyName, left, right)

  protected def leftArray: ArrayType = left.dataType.asInstanceOf[ArrayType]
  protected def rightArray: ArrayType = right.dataType.asInstanceOf[ArrayType]

  protected def elemAt(a: ArrayData, at: ArrayType, i: Int): Double =
    at.elementType match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }
}

/** `graft_dot(a, b)` — Σᵢ aᵢ·bᵢ in double, left to right. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elemAt(a, leftArray, i) * elemAt(b, rightArray, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      val getA = CodeGenerator.getValue(a, leftArray.elementType, i)
      val getB = CodeGenerator.getValue(b, rightArray.elementType, i)
      val nullA = if (leftArray.containsNull) s"$a.isNullAt($i)" else "false"
      val nullB = if (rightArray.containsNull) s"$b.isNullAt($i)" else "false"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($nullA || $nullB) { ${ev.isNull} = true; break; }
         |    $s += ((double)$getA) * ((double)$getB);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_cosine(a, b)` — a·b / (|a|·|b|) in one pass, clamped to
  * [-1, 1]; NaN (zero-norm input) passes through unclamped. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAt(a, leftArray, i)
      val y = elemAt(b, rightArray, i)
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    val c = sab / (math.sqrt(saa) * math.sqrt(sbb))
    // NaN fails both comparisons and passes through unclamped
    if (c < -1.0) -1.0 else if (c > 1.0) 1.0 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      val getA = CodeGenerator.getValue(a, leftArray.elementType, i)
      val getB = CodeGenerator.getValue(b, rightArray.elementType, i)
      val nullA = if (leftArray.containsNull) s"$a.isNullAt($i)" else "false"
      val nullB = if (rightArray.containsNull) s"$b.isNullAt($i)" else "false"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0;
         |  double $saa = 0.0;
         |  double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($nullA || $nullB) { ${ev.isNull} = true; break; }
         |    final double $x = (double)$getA;
         |    final double $y = (double)$getB;
         |    $sab += $x * $y;
         |    $saa += $x * $x;
         |    $sbb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $c = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
         |    if ($c < -1.0) { $c = -1.0; } else if ($c > 1.0) { $c = 1.0; }
         |    ${ev.value} = $c;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
