package graft.meta.expr

import graft.meta.Schema

import org.apache.spark.sql.types._

/** Column-level stats for one file or one manifest's partition-field summary;
  * all lookups are by field ID (files) or partition field ID (manifests).
  * Missing stats always mean "unknown" — evaluators stay conservative.
  */
trait MetricsSource {
  def rowCount: Long
  def valueCount(id: Int): Option[Long]
  def nullCount(id: Int): Option[Long]
  def nanCount(id: Int): Option[Long]
  def lower(id: Int): Option[Any]
  def upper(id: Int): Option[Any]
  /** True if the column may contain nulls (summaries carry this directly). */
  def mayContainNull(id: Int): Boolean =
    !nullCount(id).contains(0L)
}

/** Row-level evaluation of a bound expression via a field-ID accessor
  * (ref `api/.../expressions/Evaluator.java:48`). Values must be in
  * internal repr. */
object RowEvaluator {
  def eval(expr: Expr, get: Int => Any): Boolean = expr match {
    case TrueExpr => true
    case FalseExpr => false
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case Not(c) => !eval(c, get)
    case p: Pred => throw new IllegalStateException(s"Unbound predicate: $p")
    case BoundPred(op, id, _, t, values) =>
      val v = get(id)
      op match {
        case Op.IsNull => v == null
        case Op.NotNull => v != null
        case Op.IsNan => Literals.isNaN(v)
        case Op.NotNan => !Literals.isNaN(v)
        case _ if v == null => false
        case Op.Lt => Literals.compare(t, v, values.head) < 0
        case Op.LtEq => Literals.compare(t, v, values.head) <= 0
        case Op.Gt => Literals.compare(t, v, values.head) > 0
        case Op.GtEq => Literals.compare(t, v, values.head) >= 0
        case Op.Eq => Literals.compare(t, v, values.head) == 0
        case Op.NotEq => Literals.compare(t, v, values.head) != 0
        case Op.In => values.exists(Literals.compare(t, v, _) == 0)
        case Op.NotIn => !values.exists(Literals.compare(t, v, _) == 0)
        case Op.StartsWith => v.asInstanceOf[String].startsWith(values.head.asInstanceOf[String])
      }
  }
}

/** "Might any row in this file match?" from per-column min/max/null/nan
  * counts (ref `api/.../expressions/InclusiveMetricsEvaluator.java:54`).
  * Unknown ⇒ true. NaN bounds are treated as missing (they order above all
  * reals and would otherwise wrongly exclude).
  */
object InclusiveMetricsEvaluator {
  private val InListLimit = 200 // ref InclusiveMetricsEvaluator IN_PREDICATE_LIMIT

  def eval(expr: Expr, m: MetricsSource): Boolean = expr match {
    case TrueExpr => true
    case FalseExpr => false
    case And(l, r) => eval(l, m) && eval(r, m)
    case Or(l, r) => eval(l, m) || eval(r, m)
    case Not(_) => true // NOT(startsWith) — cannot exclude from metrics
    case p: Pred => throw new IllegalStateException(s"Unbound predicate: $p")
    case BoundPred(op, id, _, t, values) =>
      def containsNullsOnly: Boolean =
        (m.valueCount(id), m.nullCount(id)) match {
          case (Some(vc), Some(nc)) => vc == nc
          case _ => false
        }
      def containsNaNsOnly: Boolean =
        (m.valueCount(id), m.nanCount(id)) match {
          case (Some(vc), Some(nc)) => vc == nc
          case _ => false
        }
      def lowerOk: Option[Any] = m.lower(id).filterNot(Literals.isNaN)
      def upperOk: Option[Any] = m.upper(id).filterNot(Literals.isNaN)
      op match {
        case Op.IsNull => m.mayContainNull(id)
        case Op.NotNull => !containsNullsOnly
        case Op.IsNan => !m.nanCount(id).contains(0L)
        case Op.NotNan => !containsNaNsOnly
        case _ if containsNullsOnly => false
        case Op.Lt =>
          lowerOk.forall(lb => Literals.compare(t, lb, values.head) < 0)
        case Op.LtEq =>
          lowerOk.forall(lb => Literals.compare(t, lb, values.head) <= 0)
        case Op.Gt =>
          upperOk.forall(ub => Literals.compare(t, ub, values.head) > 0)
        case Op.GtEq =>
          upperOk.forall(ub => Literals.compare(t, ub, values.head) >= 0)
        case Op.Eq =>
          lowerOk.forall(lb => Literals.compare(t, lb, values.head) <= 0) &&
            upperOk.forall(ub => Literals.compare(t, ub, values.head) >= 0)
        case Op.NotEq => true
        case Op.In =>
          if (values.size > InListLimit) true
          else values.exists { v =>
            lowerOk.forall(lb => Literals.compare(t, lb, v) <= 0) &&
              upperOk.forall(ub => Literals.compare(t, ub, v) >= 0)
          }
        case Op.NotIn => true
        case Op.StartsWith =>
          val prefix = values.head.asInstanceOf[String]
          val pb = prefix.getBytes("UTF-8")
          def prefixCmp(bound: Any): Int = {
            val bb = bound.asInstanceOf[String].getBytes("UTF-8")
            Literals.compareBytes(java.util.Arrays.copyOf(bb, math.min(bb.length, pb.length)), pb)
          }
          lowerOk.forall(lb => prefixCmp(lb) <= 0) && upperOk.forall(ub => prefixCmp(ub) >= 0)
      }
  }
}

/** "Do ALL rows in this file match?" — enables metadata-only DELETE
  * (ref `api/.../expressions/StrictMetricsEvaluator.java:71`). Conservative:
  * unknown ⇒ false; literal predicates additionally require zero nulls (a
  * null row never satisfies a comparison, so a file with nulls can't be
  * wholly matched by one).
  */
object StrictMetricsEvaluator {
  def eval(expr: Expr, m: MetricsSource): Boolean = expr match {
    case TrueExpr => true
    case FalseExpr => false
    case And(l, r) => eval(l, m) && eval(r, m)
    case Or(l, r) => eval(l, m) || eval(r, m)
    case Not(_) => false
    case p: Pred => throw new IllegalStateException(s"Unbound predicate: $p")
    case BoundPred(op, id, _, t, values) =>
      def noNulls: Boolean = m.nullCount(id).contains(0L)
      def allNull: Boolean = (m.valueCount(id), m.nullCount(id)) match {
        case (Some(vc), Some(nc)) => vc == nc && vc > 0
        case _ => false
      }
      def allNaN: Boolean = (m.valueCount(id), m.nanCount(id)) match {
        case (Some(vc), Some(nc)) => vc == nc && vc > 0
        case _ => false
      }
      def bounds: Option[(Any, Any)] = for {
        lb <- m.lower(id) if !Literals.isNaN(lb)
        ub <- m.upper(id) if !Literals.isNaN(ub)
      } yield (lb, ub)
      op match {
        case Op.IsNull => allNull
        case Op.NotNull => noNulls
        case Op.IsNan => allNaN
        case Op.NotNan => m.nanCount(id).contains(0L)
        case _ if !noNulls => false
        case Op.Lt => bounds.exists { case (_, ub) => Literals.compare(t, ub, values.head) < 0 }
        case Op.LtEq => bounds.exists { case (_, ub) => Literals.compare(t, ub, values.head) <= 0 }
        case Op.Gt => bounds.exists { case (lb, _) => Literals.compare(t, lb, values.head) > 0 }
        case Op.GtEq => bounds.exists { case (lb, _) => Literals.compare(t, lb, values.head) >= 0 }
        case Op.Eq => bounds.exists { case (lb, ub) =>
          Literals.compare(t, lb, values.head) == 0 && Literals.compare(t, ub, values.head) == 0
        }
        case Op.NotEq => bounds.exists { case (lb, ub) =>
          Literals.compare(t, ub, values.head) < 0 || Literals.compare(t, lb, values.head) > 0
        }
        case Op.In => bounds.exists { case (lb, ub) =>
          Literals.compare(t, lb, ub) == 0 && values.exists(Literals.compare(t, lb, _) == 0)
        }
        case Op.NotIn => bounds.exists { case (lb, ub) =>
          values.forall(v =>
            Literals.compare(t, ub, v) < 0 || Literals.compare(t, lb, v) > 0)
        }
        case Op.StartsWith => false
      }
  }
}
