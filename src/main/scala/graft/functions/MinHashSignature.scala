package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_minhash(baseHashes[, k])` — the k-slot MinHash signature of a
  * document's shingle-hash array in ONE generated pass.
  *
  * The declarative formulation (`array(k × array_min(transform(bh,
  * mul-add-mod)))`) walks the shingle array k times interpreted and
  * allocates k intermediate arrays per row; for k = 64 that is the
  * whole cost of the signature stage. This expression keeps k running
  * minima in a primitive `long[]` and walks the array once — same
  * O(|shingles|·k) arithmetic, compiled, zero intermediates.
  *
  * Values are BIT-IDENTICAL to the declarative version (candidate sets,
  * estimates, and band buckets must not move): permutation i maps a
  * 64-bit base hash h to `(a_i·(h & 0xffffffff) + b_i) mod p` with the
  * same deterministic seeds ([[MinHashSignature.seeds]], the Mersenne
  * prime 2^31−1, products provably < 2^63 so ANSI mode cannot
  * overflow), and the degenerate shapes match `array_min`'s: an empty
  * (or all-null-element, or NULL) input produces a signature of k NULL
  * slots, never a NULL array.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k > 0, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> base hashes, got ${t.catalogString}")
  }

  @transient private lazy val (as, bs) = MinHashSignature.seeds(k)
  @transient private lazy val nullSig: GenericArrayData =
    new GenericArrayData(new Array[Any](k))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return nullSig
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val h = arr.getLong(j) & 0xffffffffL
        var i = 0
        while (i < k) {
          val x = (h * as(i) + bs(i)) % MinHashSignature.Prime
          if (x < mins(i)) mins(i) = x
          i += 1
        }
      }
      j += 1
    }
    if (!seen) nullSig else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val asRef = ctx.addReferenceObj("minhashMul", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashAdd", bs, "long[]")
    val nullSigRef = ctx.addReferenceObj("minhashNullSig", nullSig,
      classOf[GenericArrayData].getName)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val x = ctx.freshName("x")
    val mins = ctx.freshName("mins")
    val seen = ctx.freshName("seen")
    val childNullCheck =
      if (child.nullable) s"${childGen.isNull}" else "false"
    val elemNullCheck = child.dataType match {
      case ArrayType(_, true) => s"${childGen.value}.isNullAt($j)"
      case _ => "false"
    }
    val code =
      code"""
        ${childGen.code}
        ArrayData ${ev.value} = null;
        if ($childNullCheck) {
          ${ev.value} = $nullSigRef;
        } else {
          final int $n = ${childGen.value}.numElements();
          final long[] $mins = new long[$k];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          boolean $seen = false;
          for (int $j = 0; $j < $n; $j++) {
            if (!($elemNullCheck)) {
              $seen = true;
              final long $h = ${childGen.value}.getLong($j) & 0xffffffffL;
              for (int $i = 0; $i < $k; $i++) {
                final long $x = ($h * $asRef[$i] + $bsRef[$i]) % ${MinHashSignature.Prime}L;
                if ($x < $mins[$i]) { $mins[$i] = $x; }
              }
            }
          }
          ${ev.value} = $seen
            ? new org.apache.spark.sql.catalyst.util.GenericArrayData($mins)
            : (ArrayData) $nullSigRef;
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `graft_sig_agreement(sigA, sigB)` — the fraction of signature slots
  * where both sides are non-null and equal, over `size(sigA)`: the
  * MinHash estimate of Jaccard similarity. One candidate pair pays one
  * evaluation, and candidate counts scale with the corpus, so this is
  * the per-pair hot path of LSH dedup; the generated loop replaces an
  * interpreted 64-slot zip_with + conditional + aggregate chain.
  *
  * Semantics mirror that chain exactly: a slot where either side is
  * NULL contributes 0 (`when(x === y, 1).otherwise(0)` sends the null
  * comparison to the otherwise branch), slots past the shorter array's
  * end contribute 0 (zip_with's null padding), the denominator is
  * always `size(sigA)`, and a NULL array yields NULL. (One divergence:
  * an empty sigA gives NaN where the HOF's ANSI division would throw —
  * unreachable from graft_minhash, whose signatures always have k
  * slots.) */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_sig_agreement"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> signatures, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var equal = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        equal += 1
      i += 1
    }
    equal.toDouble / a.numElements()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val eq = ctx.freshName("equal")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) { $eq++; }
         |}
         |${ev.value} = ((double) $eq) / $a.numElements();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignatureAgreement =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  /** Mersenne prime 2^31−1 for the universal-hash reduction — the mod
    * is what makes each permutation reorder the shingles (a plain
    * a·h+b is monotone in h and would collapse every slot to the same
    * argmin shingle). */
  val Prime: Long = 2147483647L

  /** Deterministic multipliers / addends for the k permutations, all
    * a's drawn before all b's from one seeded generator. Bounds keep
    * every product below 2^63: a_i < 2^31, base masked to 32 bits,
    * b_i < 2^31. */
  def seeds(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(1337L)
    val as = Array.fill(k)(rnd.nextInt(Int.MaxValue - 1).toLong + 1L)
    val bs = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }
}
