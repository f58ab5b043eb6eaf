package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AttrEqLit, AttrInLits, ColumnBridge, Opaque}
import org.scalatest.funsuite.AnyFunSuite

/** The predicate-inspection bridge that partition routing stands on:
  * classification must be exactly right for BOTH tree dialects a
  * Column can carry (the ColumnNode form `col(...) === lit(...)`
  * builds, and the catalyst form `expr("...")` wraps), and everything
  * unrecognizable must classify Opaque — a wrong Opaque only costs a
  * full rewrite, a wrong pin would corrupt DML. */
class ColumnBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("equality conjuncts extract from both dialects, both operand orders") {
    val node = ColumnBridge.conjuncts(col("d") === "a" && col("k") === 2L)
    assert(node.collect { case AttrEqLit(n, l) => n -> String.valueOf(l.value) }
      === Seq("d" -> "a", "k" -> "2"))
    val flipped = ColumnBridge.conjuncts(lit(5) === col("x"))
    assert(flipped.collect { case AttrEqLit(n, _) => n } === Seq("x"))
    // SQL-TEXT dialect — how the reference issues DML predicates; the
    // raw SqlExpression node is parsed through the session parser
    spark.sparkContext // force session init so getActiveSession resolves
    val catalyst = ColumnBridge.conjuncts(expr("d = 'a' AND k = 2"))
    assert(catalyst.collect { case AttrEqLit(n, _) => n } === Seq("d", "k"))
  }

  test("IN lists and single-column OR chains classify as membership") {
    ColumnBridge.conjuncts(col("d").isin("a", "b", "c")) match {
      case Seq(AttrInLits("d", lits)) =>
        assert(lits.map(l => String.valueOf(l.value)) === Seq("a", "b", "c"))
      case other => fail(other.toString)
    }
    ColumnBridge.conjuncts(col("d") === "a" || col("d") === "b") match {
      case Seq(AttrInLits("d", lits)) => assert(lits.size === 2)
      case other => fail(other.toString)
    }
    // catalyst dialect too
    ColumnBridge.conjuncts(expr("d IN ('a','b')")) match {
      case Seq(AttrInLits("d", lits)) => assert(lits.size === 2)
      case other => fail(other.toString)
    }
    ColumnBridge.conjuncts(expr("d = 'a' OR d = 'b'")) match {
      case Seq(AttrInLits("d", _)) => ()
      case other => fail(other.toString)
    }
  }

  test("deterministic foldable value sides constant-fold to literals") {
    // the reference's daily delete pins its partition with exactly
    // this shape — DELETE … WHERE InsertDate = CURRENT_DATE() — and
    // routing must see through it like Catalyst's ConstantFolding
    spark.sparkContext
    ColumnBridge.conjuncts(expr("d = CURRENT_DATE()")) match {
      case Seq(AttrEqLit("d", l)) =>
        assert(l.dataType === org.apache.spark.sql.types.DateType)
      case other => fail(other.toString)
    }
    // node dialect: the builder spelling of the same predicate
    ColumnBridge.conjuncts(col("d") === current_date()) match {
      case Seq(AttrEqLit("d", l)) =>
        assert(l.dataType === org.apache.spark.sql.types.DateType)
      case other => fail(other.toString)
    }
    // tz-aware cast of a literal folds (ResolveTimeZone + eval)
    ColumnBridge.conjuncts(expr("d = CAST('2024-01-01' AS DATE)")) match {
      case Seq(AttrEqLit("d", l)) =>
        assert(String.valueOf(l.value) === "19723")
      case other => fail(other.toString)
    }
    // foldables inside IN lists fold too
    ColumnBridge.conjuncts(expr("d IN (CURRENT_DATE(), DATE'2024-01-01')")) match {
      case Seq(AttrInLits("d", lits)) => assert(lits.size === 2)
      case other => fail(other.toString)
    }
    // NONDETERMINISTIC values must NOT fold — a pin on rand() would
    // freeze a value the predicate would re-draw per row
    assert(ColumnBridge.conjuncts(col("d") === rand()) === Seq(Opaque))
    assert(ColumnBridge.conjuncts(expr("d = rand()")) === Seq(Opaque))
  }

  test("anything a pin could misread classifies Opaque") {
    // OR across different columns is NOT a membership
    assert(ColumnBridge.conjuncts(col("d") === "a" || col("k") === 1L)
      === Seq(Opaque))
    // non-literal side, cast around the attribute, function call
    assert(ColumnBridge.conjuncts(col("d") === col("e")) === Seq(Opaque))
    assert(ColumnBridge.conjuncts(upper(col("d")) === "A") === Seq(Opaque))
    assert(ColumnBridge.conjuncts(expr("CAST(d AS INT) = 1")) === Seq(Opaque))
    // IN with a non-literal element
    assert(ColumnBridge.conjuncts(col("d").isin("a") || upper(col("d")) === "B")
      === Seq(Opaque))
    // mixed AND keeps per-conjunct classification
    val mixed = ColumnBridge.conjuncts(col("d") === "a" && upper(col("k")) === "X")
    assert(mixed.count(_.isInstanceOf[AttrEqLit]) === 1)
    assert(mixed.count(_ == Opaque) === 1)
  }
}
