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

  /** Best-effort conversion of a DSv2-pushed `sources.Filter` into the
    * predicate ADT (ref `spark3/.../SparkFilters.java:76`). `None` means the
    * filter can't prune metadata — the engine still applies it row-wise.
    * ONLY safe for scan pruning: `And` converts partially (each conjunct
    * prunes independently), which yields a WEAKER predicate. */
  def fromV1(f: org.apache.spark.sql.sources.Filter): Option[GExpr] =
    fromV1(f, strict = false)

  /** Exact conversion: `None` unless EVERY node converts. Required wherever
    * the result selects rows to delete/rewrite (overwrite-by-filter,
    * row-level ops) — a partially-converted `And` there would delete rows the
    * original filter did not match (silent data loss; ref `SparkFilters.java`
    * refuses partial And conversion for the same reason). */
  def fromV1Strict(f: org.apache.spark.sql.sources.Filter): Option[GExpr] =
    fromV1(f, strict = true)

  private def fromV1(f: org.apache.spark.sql.sources.Filter, strict: Boolean): Option[GExpr] = {
    import org.apache.spark.sql.{sources => s}
    def lit(v: Any): Any = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000L + i.getNano / 1000
      case ldt: java.time.LocalDateTime =>
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
      case other => other
    }
    f match {
      case s.AlwaysTrue() => Some(graft.meta.expr.TrueExpr)
      case s.AlwaysFalse() => Some(graft.meta.expr.FalseExpr)
      case s.IsNull(a) => Some(Exprs.isNull(a))
      case s.IsNotNull(a) => Some(Exprs.notNull(a))
      case s.EqualTo(a, v) if v != null => Some(Exprs.equalTo(a, lit(v)))
      case s.EqualNullSafe(a, null) => Some(Exprs.isNull(a))
      case s.EqualNullSafe(a, v) => Some(Exprs.equalTo(a, lit(v)))
      case s.LessThan(a, v) => Some(Exprs.lessThan(a, lit(v)))
      case s.LessThanOrEqual(a, v) => Some(Exprs.lessThanOrEqual(a, lit(v)))
      case s.GreaterThan(a, v) => Some(Exprs.greaterThan(a, lit(v)))
      case s.GreaterThanOrEqual(a, v) => Some(Exprs.greaterThanOrEqual(a, lit(v)))
      case s.In(a, vs) if !vs.contains(null) => Some(Exprs.in(a, vs.map(lit).toIndexedSeq: _*))
      case s.StringStartsWith(a, p) => Some(Exprs.startsWith(a, p))
      // And may convert partially in pruning mode — each conjunct prunes
      // independently. In strict mode both sides must convert exactly.
      case s.And(l, r) => (fromV1(l, strict), fromV1(r, strict)) match {
        case (Some(cl), Some(cr)) => Some(GAnd(cl, cr))
        case (one @ Some(_), None) if !strict => one
        case (None, one @ Some(_)) if !strict => one
        case _ => None
      }
      // Or must NOT be converted partially: a dropped branch changes semantics
      case s.Or(l, r) =>
        for (cl <- fromV1(l, strict); cr <- fromV1(r, strict)) yield GOr(cl, cr)
      // Under Not the polarity flips: a partially-converted child (weaker)
      // becomes STRONGER after negation, so the subtree must convert exactly
      case s.Not(c) => fromV1(c, strict = true).map(GNot)
      case _ => None
    }
  }

  /** Pruning-only conversion of a resolved catalyst predicate: an
    * unconvertible subtree weakens to TRUE (And keeps the other conjunct; Or
    * and Not weaken whole — under Not a weaker child would STRENGTHEN).
    * Returns the weaker expression plus whether it is exact. Callers must
    * re-apply the original predicate row-wise whenever exact is false. */
  def convertPartial(e: Expression): (GExpr, Boolean) = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      val (cl, el) = convertPartial(l); val (cr, er) = convertPartial(r)
      val both = (cl, cr) match {
        case (graft.meta.expr.TrueExpr, b) => b
        case (a, graft.meta.expr.TrueExpr) => a
        case (a, b) => GAnd(a, b)
      }
      (both, el && er)
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
      val (cl, el) = convertPartial(l); val (cr, er) = convertPartial(r)
      if (el && er) (GOr(cl, cr), true) else (graft.meta.expr.TrueExpr, false)
    case org.apache.spark.sql.catalyst.expressions.Not(c) =>
      val (cc, ec) = convertPartial(c)
      if (ec) (GNot(cc), true) else (graft.meta.expr.TrueExpr, false)
    case other =>
      try (convert(other), true)
      catch { case _: UnsupportedOperationException => (graft.meta.expr.TrueExpr, false) }
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
