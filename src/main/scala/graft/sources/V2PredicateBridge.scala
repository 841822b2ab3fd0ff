package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

/** DSv2 `Predicate` → catalyst `Expression` translation for the SQL
  * DELETE path (`DeleteFromTableExec` hands the parsed WHERE clause to
  * [[GraftSnapshotTable.deleteWhere]] as V2 predicates; the catalog
  * re-evaluates it against the head snapshot to compute the delete
  * vector).
  *
  * Deliberately CONSERVATIVE — the mirror of
  * [[GraftSidecarFileIndex.extract]]'s stance on the read side: a
  * shape the translator does not understand yields `None`, which
  * surfaces as `canDeleteWhere = false` and a loud analysis error,
  * never a wrong delete. Field references resolve by NAME against the
  * table being deleted from (an `UnresolvedAttribute` the filter's
  * analyzer binds), and literals carry Spark's own internal
  * representation straight through (`LiteralValue` stores catalyst
  * form — `UTF8String`, `Decimal`, days/micros — exactly what
  * `Literal(value, dataType)` expects; matched through the public
  * `Literal` interface, the concrete `LiteralValue` is
  * `private[sql]`). */
object V2PredicateBridge {

  def toCatalyst(e: V2Expression): Option[Expression] = e match {
    case lv: V2Literal[_] => Some(Literal(lv.value, lv.dataType))
    case ref: NamedReference =>
      Some(UnresolvedAttribute(ref.fieldNames.toSeq))
    case p: V2Predicate => predicate(p)
    case _ => None
  }

  private def predicate(p: V2Predicate): Option[Expression] = {
    def kids: Option[Seq[Expression]] = {
      val ks = p.children().toSeq.map(toCatalyst)
      if (ks.forall(_.isDefined)) Some(ks.map(_.get)) else None
    }
    def binary(f: (Expression, Expression) => Expression): Option[Expression] =
      kids.collect { case Seq(l, r) => f(l, r) }
    def unary(f: Expression => Expression): Option[Expression] =
      kids.collect { case Seq(c) => f(c) }
    p.name() match {
      case "ALWAYS_TRUE" => Some(Literal.TrueLiteral)
      case "ALWAYS_FALSE" => Some(Literal.FalseLiteral)
      case "AND" => binary(And(_, _))
      case "OR" => binary(Or(_, _))
      case "NOT" => unary(Not(_))
      case "=" => binary(EqualTo(_, _))
      case "<>" => binary((l, r) => Not(EqualTo(l, r)))
      case "<=>" => binary(EqualNullSafe(_, _))
      case "<" => binary(LessThan(_, _))
      case "<=" => binary(LessThanOrEqual(_, _))
      case ">" => binary(GreaterThan(_, _))
      case ">=" => binary(GreaterThanOrEqual(_, _))
      case "IS_NULL" => unary(IsNull(_))
      case "IS_NOT_NULL" => unary(IsNotNull(_))
      case "STARTS_WITH" => binary(StartsWith(_, _))
      case "ENDS_WITH" => binary(EndsWith(_, _))
      case "CONTAINS" => binary(Contains(_, _))
      case "IN" => kids.collect { case v +: vs if vs.nonEmpty => In(v, vs) }
      case _ => None
    }
  }
}
