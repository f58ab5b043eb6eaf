package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, Literal => CLit}
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}
import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit, UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}

/** What a predicate's top-level AND tree says about one conjunct:
  * either a recognizable `column = literal` equality (both operand
  * orders) or something this inspection refuses to interpret. */
sealed trait Conjunct
final case class AttrEqLit(name: String, lit: CLit) extends Conjunct
case object Opaque extends Conjunct

/** Bridge to Spark's `private[sql]` Column internals. Spark 4 made
  * `Column.expr` internal (Columns are connect-agnostic ColumnNode
  * trees now); inspecting a user-supplied predicate — e.g. to extract
  * partition-pruning equality conjuncts in
  * [[graft.catalog.ParquetTable]] — still needs the tree, and this
  * package-placed object is the supported access point the classic
  * Dataset API itself uses. */
object ColumnBridge {

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The predicate's top-level AND conjuncts, each classified. Handles
    * both tree dialects a Column can carry: the connect-agnostic
    * ColumnNode form that `col("x") === lit(v)` builds, and catalyst
    * expressions wrapped by `expr("x = 'v'")` / Dataset-resolved
    * columns. Anything unrecognized — ORs, casts, non-literal sides —
    * classifies as [[Opaque]], never throws: callers must treat opaque
    * conjuncts as "cannot route" and fall back. */
  def conjuncts(c: Column): Seq[Conjunct] = flattenNode(c.node)

  private def flattenNode(n: ColumnNode): Seq[Conjunct] = n match {
    case NFn("and", scala.collection.Seq(l, r), _, _, _, _) =>
      flattenNode(l) ++ flattenNode(r)
    case NFn("=", scala.collection.Seq(a, b), _, _, _, _) =>
      Seq(eqNode(a, b))
    case ExpressionColumnNode(e, _) => flattenExpr(e)
    case _ => Seq(Opaque)
  }

  private def eqNode(a: ColumnNode, b: ColumnNode): Conjunct = (a, b) match {
    case (NAttr(scala.collection.Seq(name), _, _, _), NLit(v, dt, _)) =>
      scala.util.Try(AttrEqLit(name, toLit(v, dt))).getOrElse(Opaque)
    case (NLit(v, dt, _), NAttr(scala.collection.Seq(name), _, _, _)) =>
      scala.util.Try(AttrEqLit(name, toLit(v, dt))).getOrElse(Opaque)
    case _ => Opaque
  }

  private def toLit(v: Any, dt: Option[org.apache.spark.sql.types.DataType]): CLit =
    dt.fold(CLit(v))(t => CLit.create(v, t))

  private def flattenExpr(e: Expression): Seq[Conjunct] = e match {
    case And(l, r) => flattenExpr(l) ++ flattenExpr(r)
    case EqualTo(a: Attribute, l: CLit) => Seq(AttrEqLit(a.name, l))
    case EqualTo(l: CLit, a: Attribute) => Seq(AttrEqLit(a.name, l))
    case _ => Seq(Opaque)
  }
}
