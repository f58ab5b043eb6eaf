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
  * Soundness: the guard is attached IN PLACE — the matched predicate
  * `pred` is rewritten to `And(guard, pred)` inside whatever boolean
  * context it sits in. Because `pred ⇒ guard` (and both are null on
  * exactly the null-operand rows), `And(guard, pred) ⇔ pred` as an
  * expression, so the rewrite is equivalence-preserving under OR and
  * NOT too. ANDing the guard at the TOP of the condition instead
  * would be wrong for `lev(a,b) <= k OR other` — the guard is not
  * implied by the disjunction and would drop `other`-only rows.
  *
  * Idempotency (required for the optimizer's fixed-point loop): a
  * predicate whose conjunctive scope already contains a length guard
  * mentioning one of its operands is left untouched — this survives
  * constant folding (`length('CANADA')` → `6`) and And-reassociation
  * between optimizer iterations.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] with PredicateHelper {

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

  /** Is `g` a length-difference guard mentioning either lev operand? */
  private def isGuardExpr(g: Expression, lev: Levenshtein): Boolean =
    g match {
      case LessThanOrEqual(a: Abs, _) =>
        a.child match {
          case s: Subtract =>
            isLengthOf(s.left, lev.left) || isLengthOf(s.right, lev.left) ||
              isLengthOf(s.left, lev.right) || isLengthOf(s.right, lev.right)
          case _ => false
        }
      case _ => false
    }

  /** Rewrite bounded-lev predicates to `And(guard, pred)` in place.
    *
    * `scope` carries every conjunct visible at this point (outer
    * conjunctive scopes accumulate through nested Ands and pass
    * unchanged through Or branches — an outer-ANDed guard still covers
    * a predicate inside a disjunct). Recursion stops at any node that
    * is not And/Or: wrapping inside other expression trees (CaseWhen
    * arms, aggregate arguments) buys nothing and risks corners. */
  private def rewrite(e: Expression, scope: Seq[Expression]): Expression =
    boundedLev(e) match {
      case Some((lev, k)) =>
        if (scope.exists(isGuardExpr(_, lev))) e
        else And(guardFor(lev, k), e)
      case None => e match {
        case a: And =>
          val conjScope = scope ++ splitConjunctivePredicates(a)
          val nl = rewrite(a.left, conjScope)
          val nr = rewrite(a.right, conjScope)
          if ((nl eq a.left) && (nr eq a.right)) a else And(nl, nr)
        case o: Or =>
          val nl = rewrite(o.left, scope)
          val nr = rewrite(o.right, scope)
          if ((nl eq o.left) && (nr eq o.right)) o else Or(nl, nr)
        case other => other
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val g = rewrite(cond, Nil)
      if (g eq cond) f else f.copy(condition = g)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = rewrite(cond, Nil)
      if (g eq cond) j else j.copy(condition = Some(g))
  }
}
