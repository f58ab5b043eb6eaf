package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, In, Literal => CLit, Or, TimeZoneAwareExpression}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode, ExpressionUtils}
import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit, SQLConf, UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}

/** What a predicate's top-level AND tree says about one conjunct:
  * a recognizable `column = literal` equality (both operand orders), a
  * `column IN (literals…)` membership — including the equivalent
  * OR-of-equalities spelling on ONE column — or something this
  * inspection refuses to interpret. */
sealed trait Conjunct
final case class AttrEqLit(name: String, lit: CLit) extends Conjunct
final case class AttrInLits(name: String, lits: Seq[CLit]) extends Conjunct
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

  /** `name IN values` as a CONSTANT-SIZE plan node: `isInCollection`
    * over K values builds an `In` tree with K literal children that
    * the analyzer and optimizer walk repeatedly — measured ~seconds of
    * driver time per query at K ≈ 10⁵ — while `InSet` carries the
    * value set as DATA (one node), still folds to false on an empty
    * set, and still pushes to parquet as a `sources.In` filter (the
    * hybrid-index serve relies on that footer pruning). */
  def inSet(name: String, values: Set[Any]): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.InSet(
        // quoted: `name` is ONE column (col(name) semantics) — the
        // plain apply would dot-split it into a multipart identifier
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          .quoted(name),
        // InSet carries CATALYST-internal values (UTF8String for
        // strings, not java.lang.String — longs pass through); convert
        // each element the way Literal construction would
        values.map(org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToCatalyst)))

  /** The predicate's top-level AND conjuncts, each classified. Handles
    * both tree dialects a Column can carry: the connect-agnostic
    * ColumnNode form that `col("x") === lit(v)` builds, and catalyst
    * expressions wrapped by `expr("x = 'v'")` / Dataset-resolved
    * columns. Anything unrecognized — mixed ORs, casts, non-literal
    * sides — classifies as [[Opaque]], never throws: callers must treat
    * opaque conjuncts as "cannot route" and fall back. */
  def conjuncts(c: Column): Seq[Conjunct] = flattenNode(c.node)

  private def flattenNode(n: ColumnNode): Seq[Conjunct] = n match {
    case NFn("and", scala.collection.Seq(l, r), _, _, _, _) =>
      flattenNode(l) ++ flattenNode(r)
    case NFn("=", scala.collection.Seq(a, b), _, _, _, _) =>
      Seq(eqNode(a, b))
    case NFn("in", scala.collection.Seq(a, rest @ _*), _, _, _, _) =>
      Seq(inNode(a, rest))
    case NFn("or", _, _, _, _, _) =>
      Seq(orAsIn(n))
    case ExpressionColumnNode(e, _) => flattenExpr(e)
    // expr("InsertDate = '2024-01-01'") carries the RAW SQL TEXT — and
    // SQL-text predicates are exactly how the reference issues DML, so
    // they must route like the builder form. Parse through the active
    // session's parser (unresolved attributes + literals are all the
    // classifier needs); any parse failure stays Opaque.
    case org.apache.spark.sql.internal.SqlExpression(sql, _) =>
      org.apache.spark.sql.SparkSession.getActiveSession match {
        case Some(s) =>
          scala.util.Try(s.sessionState.sqlParser.parseExpression(sql))
            .map(flattenExpr).getOrElse(Seq(Opaque))
        case None => Seq(Opaque)
      }
    case _ => Seq(Opaque)
  }

  private def eqNode(a: ColumnNode, b: ColumnNode): Conjunct = (a, b) match {
    case (NAttr(scala.collection.Seq(name), _, _, _), v) =>
      nodeLit(v).map(AttrEqLit(name, _)).getOrElse(Opaque)
    case (v, NAttr(scala.collection.Seq(name), _, _, _)) =>
      nodeLit(v).map(AttrEqLit(name, _)).getOrElse(Opaque)
    case _ => Opaque
  }

  private def inNode(a: ColumnNode, vals: Seq[ColumnNode]): Conjunct = a match {
    case NAttr(scala.collection.Seq(name), _, _, _) if vals.nonEmpty =>
      val lits = vals.map(nodeLit)
      if (lits.forall(_.isDefined)) AttrInLits(name, lits.map(_.get))
      else Opaque
    case _ => Opaque
  }

  /** The value side of a pin as a Literal: a literal node directly, or
    * a deterministic foldable expression (`current_date()`,
    * `CAST('2024-01-01' AS DATE)`) constant-folded — the reference's
    * daily delete pins its partition with exactly that shape
    * (`DELETE … WHERE InsertDate = CURRENT_DATE()`), and routing must
    * see through it the way Catalyst's ConstantFolding does. Anything
    * non-foldable or nondeterministic stays None → Opaque. */
  private def nodeLit(n: ColumnNode): Option[CLit] = n match {
    case NLit(v, dt, _) => scala.util.Try(toLit(v, dt)).toOption
    case NAttr(_, _, _, _) => None
    case _ =>
      scala.util.Try(ColumnNodeToExpressionConverter(n)).toOption.flatMap(foldLit)
  }

  /** Constant-fold a value expression to the Literal it denotes.
    * Timezone-aware foldables (CurrentDate, string→date casts) parsed
    * from SQL text carry no zone yet — resolve them against the session
    * zone first, exactly what analysis' ResolveTimeZone would do. */
  private def foldLit(e: Expression): Option[CLit] = e match {
    case l: CLit => Some(l)
    case _ =>
      import org.apache.spark.sql.catalyst.FunctionIdentifier
      import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedFunction => UFn}
      val resolved = e.transformUp {
        // builtin-function lookup (ResolveFunctions' simple case):
        // CURRENT_DATE() parsed from SQL text is still unresolved here
        case f: UFn if f.nameParts.size == 1 && !f.isDistinct &&
            f.filter.isEmpty && f.orderingWithinGroup.isEmpty =>
          scala.util.Try(FunctionRegistry.builtin.lookupFunction(
            FunctionIdentifier(f.nameParts.head), f.arguments)).getOrElse(f)
      }.transformUp {
        // unevaluable wrappers like to_date expose their real form via
        // replacement (the optimizer's ReplaceExpressions rule)
        case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
            if r.childrenResolved => r.replacement
      }.transformUp {
        // session-zone assignment (ResolveTimeZone): CurrentDate and
        // string→date casts need a zone before they can eval
        case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
          t.withTimeZone(SQLConf.get.sessionLocalTimeZone)
      }
      if (resolved.resolved && resolved.foldable && resolved.deterministic)
        scala.util.Try(CLit.create(resolved.eval(null), resolved.dataType)).toOption
      else None
  }

  /** An OR tree that is entirely `col = lit` equalities on ONE shared
    * column is the IN spelling (`d = 'a' OR d = 'b'`) — classify it as
    * membership so partition routing treats both forms alike. Any
    * other OR stays opaque. */
  private def orAsIn(n: ColumnNode): Conjunct = {
    def leaves(x: ColumnNode): Option[Seq[Conjunct]] = x match {
      case NFn("or", scala.collection.Seq(l, r), _, _, _, _) =>
        for (a <- leaves(l); b <- leaves(r)) yield a ++ b
      case NFn("=", scala.collection.Seq(a, b), _, _, _, _) =>
        Some(Seq(eqNode(a, b)))
      case _ => None
    }
    leaves(n) match {
      case Some(eqs) if eqs.forall(_.isInstanceOf[AttrEqLit]) =>
        val es = eqs.collect { case e: AttrEqLit => e }
        val names = es.map(_.name.toLowerCase).distinct
        if (names.size == 1) AttrInLits(es.head.name, es.map(_.lit))
        else Opaque
      case _ => Opaque
    }
  }

  private def toLit(v: Any, dt: Option[org.apache.spark.sql.types.DataType]): CLit =
    dt.fold(CLit(v))(t => CLit.create(v, t))

  private def flattenExpr(e: Expression): Seq[Conjunct] = e match {
    case And(l, r) => flattenExpr(l) ++ flattenExpr(r)
    case EqualTo(a: Attribute, v) =>
      Seq(foldLit(v).map(AttrEqLit(a.name, _)).getOrElse(Opaque))
    case EqualTo(v, a: Attribute) =>
      Seq(foldLit(v).map(AttrEqLit(a.name, _)).getOrElse(Opaque))
    case In(a: Attribute, vs) if vs.nonEmpty =>
      val lits = vs.map(foldLit)
      if (lits.forall(_.isDefined)) Seq(AttrInLits(a.name, lits.map(_.get)))
      else Seq(Opaque)
    case o: Or =>
      def leaves(x: Expression): Option[Seq[Conjunct]] = x match {
        case Or(l, r) => for (a <- leaves(l); b <- leaves(r)) yield a ++ b
        case EqualTo(a: Attribute, v) =>
          foldLit(v).map(l => Seq(AttrEqLit(a.name, l)))
        case EqualTo(v, a: Attribute) =>
          foldLit(v).map(l => Seq(AttrEqLit(a.name, l)))
        case _ => None
      }
      leaves(o) match {
        case Some(eqs) =>
          val es = eqs.collect { case e: AttrEqLit => e }
          if (es.size == eqs.size && es.map(_.name.toLowerCase).distinct.size == 1)
            Seq(AttrInLits(es.head.name, es.map(_.lit)))
          else Seq(Opaque)
        case None => Seq(Opaque)
      }
    case _ => Seq(Opaque)
  }
}
