package graft.table

import graft.meta.expr.{And => GAnd, Expr => GExpr, Exprs, Not => GNot, Or => GOr}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Converts Spark filter `Column`s / catalyst trees into graft's predicate
  * ADT for metadata pruning (the SQL-string entry point of `TableScan.filter`;
  * the DSv2-shaped analogue of ref `spark3/.../SparkFilters.java:76`).
  * Unsupported shapes throw — the caller must pass a convertible filter so
  * pruning and data filtering agree.
  */
object SparkFilterConv {

  def fromColumn(c: Column): GExpr = convert(ColumnBridge.expression(c))

  private def name(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.name
    case a: AttributeReference => a.name
    case Cast(child, _, _, _) => name(child) // casts inserted around literals
    case other => throw new UnsupportedOperationException(s"Not a column ref: $other")
  }

  private def value(e: Expression): Any = e match {
    case Literal(v, t) => (v, t) match {
      case (u: org.apache.spark.unsafe.types.UTF8String, _) => u.toString
      case (d: org.apache.spark.sql.types.Decimal, _) => d.toJavaBigDecimal
      case (days: Integer, DateType) => days.intValue
      case (micros: java.lang.Long, TimestampType | TimestampNTZType) => micros.longValue
      case (other, _) => other
    }
    case Cast(child, _, _, _) => value(child)
    case other => throw new UnsupportedOperationException(s"Not a literal: $other")
  }

  private def isRef(e: Expression): Boolean = e match {
    case _: UnresolvedAttribute | _: AttributeReference => true
    case Cast(child, _, _, _) => isRef(child)
    case _ => false
  }

  def convert(e: Expression): GExpr = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) => GAnd(convert(l), convert(r))
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) => GOr(convert(l), convert(r))
    case org.apache.spark.sql.catalyst.expressions.Not(c) => GNot(convert(c))
    case Literal(true, _) => graft.meta.expr.TrueExpr
    case Literal(false, _) => graft.meta.expr.FalseExpr
    case IsNull(c) => Exprs.isNull(name(c))
    case IsNotNull(c) => Exprs.notNull(name(c))
    case IsNaN(c) => Exprs.isNaN(name(c))
    case EqualTo(l, r) if isRef(l) => Exprs.equalTo(name(l), value(r))
    case EqualTo(l, r) if isRef(r) => Exprs.equalTo(name(r), value(l))
    case EqualNullSafe(l, r) if isRef(l) && !value(r).equals(null) =>
      Exprs.equalTo(name(l), value(r))
    case LessThan(l, r) if isRef(l) => Exprs.lessThan(name(l), value(r))
    case LessThan(l, r) if isRef(r) => Exprs.greaterThan(name(r), value(l))
    case LessThanOrEqual(l, r) if isRef(l) => Exprs.lessThanOrEqual(name(l), value(r))
    case LessThanOrEqual(l, r) if isRef(r) => Exprs.greaterThanOrEqual(name(r), value(l))
    case GreaterThan(l, r) if isRef(l) => Exprs.greaterThan(name(l), value(r))
    case GreaterThan(l, r) if isRef(r) => Exprs.lessThan(name(r), value(l))
    case GreaterThanOrEqual(l, r) if isRef(l) => Exprs.greaterThanOrEqual(name(l), value(r))
    case GreaterThanOrEqual(l, r) if isRef(r) => Exprs.lessThanOrEqual(name(r), value(l))
    case In(c, list) if isRef(c) => Exprs.in(name(c), list.map(value): _*)
    case InSet(c, set) if isRef(c) => Exprs.in(name(c), set.toSeq: _*)
    case StartsWith(c, p) if isRef(c) =>
      Exprs.startsWith(name(c), value(p).asInstanceOf[String])
    case other =>
      throw new UnsupportedOperationException(s"Cannot convert filter: $other")
  }
}
