package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prepend a cheap length-difference guard to bounded
  * edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most 1), so the guard is a
  * sound pre-filter — and it is CHEAP (two length reads) where the
  * edit distance is O(len²) per pair. In a blocked fuzzy join the
  * guard runs before the quadratic kernel and, when the predicate
  * sits in a join condition, Catalyst can push the derived length
  * computations toward the scans. Catalyst has no such rule of its
  * own (it special-cases `LIKE`, not bounded edit distance).
  *
  * Soundness: guard AND original ⇔ original, because guard is implied.
  * Idempotency (required for the optimizer's fixed-point loop): a
  * predicate already carrying its guard is left untouched —
  * [[withGuards]] checks for a semantically-equal guard before adding
  * one.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] {

  /** The guard expression for `levenshtein(a, b) <= k`. */
  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  /** Only the 2-arg levenshtein: the 3-arg threshold form returns -1
    * past the threshold, so `lev(a,b,t) <= k` can be TRUE for pairs the
    * length guard would drop — guarding it would change semantics. */
  private def boundedLev(e: Expression): Option[(Levenshtein, Expression)] =
    e match {
      case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, _))
        if lev.children.size == 2 => Some((lev, k))
      case LessThan(lev: Levenshtein, k @ Literal(_, _))
        if lev.children.size == 2 => Some((lev, k))
      case _ => None
    }

  /** True when `e` is (or folds to) length(operand). The comparison
    * must be structural, not semanticEquals on the full guard: constant
    * folding rewrites `length('CANADA')` to `6` between optimizer
    * iterations, and an exact-match check would re-add the guard every
    * pass. */
  private def isLengthOf(e: Expression, operand: Expression): Boolean =
    e match {
      case l: Length => l.child.semanticEquals(operand)
      case _         => false
    }

  /** Any existing length-difference guard mentioning either operand. */
  private def hasGuardFor(cond: Expression, lev: Levenshtein): Boolean =
    cond.exists {
      case LessThanOrEqual(a: Abs, _) =>
        a.child match {
          case s: Subtract =>
            isLengthOf(s.left, lev.left) || isLengthOf(s.right, lev.left) ||
              isLengthOf(s.left, lev.right) || isLengthOf(s.right, lev.right)
          case _ => false
        }
      case _ => false
    }

  private def withGuards(cond: Expression): Expression = {
    // collect the guards missing from this condition, then AND them on
    val needed = scala.collection.mutable.ArrayBuffer.empty[Expression]
    cond.foreach { e =>
      boundedLev(e).foreach { case (lev, k) =>
        if (!hasGuardFor(cond, lev)) {
          val g = guardFor(lev, k)
          if (!needed.exists(_.semanticEquals(g))) needed += g
        }
      }
    }
    needed.foldLeft(cond)((acc, g) => And(g, acc))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) if withGuards(cond) ne cond =>
      f.copy(condition = withGuards(cond))
    case j @ Join(_, _, _, Some(cond), _) if withGuards(cond) ne cond =>
      j.copy(condition = Some(withGuards(cond)))
  }
}
