package graft.meta.expr

import graft.meta.{PartitionField, PartitionSpec, Schema}
import graft.meta.transforms._

import org.apache.spark.sql.types.{DataType, StringType}

/** Projects a data-space predicate into partition space
  * (ref `api/.../expressions/Projections.java:73,113` +
  * `transforms/ProjectionUtil.java`). Projected predicates are BoundPreds
  * whose fieldId is the *partition field id* and whose type is the
  * transform's result type.
  *
  *  - inclusive: partition-pred true for every partition that MIGHT contain
  *    matching rows (non-projectable ⇒ TRUE).
  *  - strict: partition-pred true only for partitions where ALL rows match
  *    (non-projectable ⇒ FALSE).
  */
object Projections {

  def inclusive(spec: PartitionSpec, schema: Schema, expr: Expr): Expr =
    project(spec, schema, Exprs.rewriteNot(expr), strict = false)

  def strict(spec: PartitionSpec, schema: Schema, expr: Expr): Expr =
    project(spec, schema, Exprs.rewriteNot(expr), strict = true)

  private def project(spec: PartitionSpec, schema: Schema, expr: Expr,
      strict: Boolean): Expr = expr match {
    case TrueExpr => TrueExpr
    case FalseExpr => FalseExpr
    case And(l, r) => (project(spec, schema, l, strict), project(spec, schema, r, strict)) match {
      case (FalseExpr, _) | (_, FalseExpr) => FalseExpr
      case (TrueExpr, b) => b
      case (a, TrueExpr) => a
      case (a, b) => And(a, b)
    }
    case Or(l, r) => (project(spec, schema, l, strict), project(spec, schema, r, strict)) match {
      case (TrueExpr, _) | (_, TrueExpr) => TrueExpr
      case (FalseExpr, b) => b
      case (a, FalseExpr) => a
      case (a, b) => Or(a, b)
    }
    case Not(_) => if (strict) FalseExpr else TrueExpr // only NOT(startsWith) survives rewrite
    case p: Pred =>
      project(spec, schema, Binder.bind(schema, p), strict)
    case p: BoundPred =>
      val parts = spec.fieldsBySourceId(p.fieldId)
      if (parts.isEmpty) { if (strict) FalseExpr else TrueExpr }
      else {
        val projected = parts.map { pf =>
          projectPred(pf, schema, p, strict)
            .getOrElse(if (strict) FalseExpr else TrueExpr)
        }
        // multiple transforms of one source column: each inclusive projection
        // is NECESSARY (AND tightens), each strict projection is SUFFICIENT
        // on its own (OR — ref Projections.java:113); AND-reducing strict
        // would be sound but misses e.g. day+hour specs
        if (strict) projected.reduce[Expr] {
          case (FalseExpr, b) => b
          case (a, FalseExpr) => a
          case (TrueExpr, _) | (_, TrueExpr) => TrueExpr
          case (a, b) => Or(a, b)
        } else projected.reduce[Expr] {
          case (TrueExpr, b) => b
          case (a, TrueExpr) => a
          case (FalseExpr, _) | (_, FalseExpr) => FalseExpr
          case (a, b) => And(a, b)
        }
      }
  }

  /** ref ProjectionUtil rules; None = not projectable. */
  private def projectPred(pf: PartitionField, schema: Schema, p: BoundPred,
      strict: Boolean): Option[Expr] = {
    val srcType = schema.fieldType(p.fieldId)
    val resType = pf.transform.resultType(srcType)
    def t(v: Any): Any = pf.transform.apply(v, srcType)
    def out(op: Op, vs: Seq[Any]): Option[Expr] =
      Some(BoundPred(op, pf.fieldId, pf.name, resType, vs))

    // unary predicates project through every KNOWN transform (null/nan in ⇒
    // null out); an unknown transform's null behavior cannot be assumed
    p.op match {
      case Op.IsNull | Op.NotNull | Op.IsNan | Op.NotNan =>
        return pf.transform match {
          case VoidTransform | UnknownTransform(_) => None
          case _ => out(p.op, Nil)
        }
      case _ =>
    }

    pf.transform match {
      case VoidTransform => None
      case IdentityTransform => out(p.op, p.values)
      case BucketTransform(_) =>
        (strict, p.op) match {
          case (false, Op.Eq) => out(Op.Eq, Seq(t(p.values.head)))
          case (false, Op.In) => out(Op.In, p.values.map(t).distinct)
          case (true, Op.NotEq) => out(Op.NotEq, Seq(t(p.values.head)))
          case (true, Op.NotIn) => out(Op.NotIn, p.values.map(t).distinct)
          case _ => None
        }
      case tr if tr.preservesOrder =>
        val v = p.values.headOption.orNull
        def dec = Literals.decrement(srcType, v)
        def inc = Literals.increment(srcType, v)
        if (!strict) {
          // ref ProjectionUtil.truncateInteger/truncateLong (inclusive)
          p.op match {
            case Op.Lt => Some(dec.fold(BoundPred(Op.LtEq, pf.fieldId, pf.name, resType, Seq(t(v))))(
              v1 => BoundPred(Op.LtEq, pf.fieldId, pf.name, resType, Seq(t(v1)))))
            case Op.LtEq => out(Op.LtEq, Seq(t(v)))
            case Op.Gt => Some(inc.fold(BoundPred(Op.GtEq, pf.fieldId, pf.name, resType, Seq(t(v))))(
              v1 => BoundPred(Op.GtEq, pf.fieldId, pf.name, resType, Seq(t(v1)))))
            case Op.GtEq => out(Op.GtEq, Seq(t(v)))
            case Op.Eq => out(Op.Eq, Seq(t(v)))
            case Op.In => out(Op.In, p.values.map(t).distinct)
            case Op.StartsWith => projectStartsWith(pf, srcType, resType, v)
            case _ => None
          }
        } else {
          // ref ProjectionUtil.truncateIntegerStrict/truncateLongStrict
          p.op match {
            case Op.Lt => out(Op.Lt, Seq(t(v)))
            case Op.LtEq => inc.map(v1 => BoundPred(Op.Lt, pf.fieldId, pf.name, resType, Seq(t(v1))))
              .orElse(out(Op.Lt, Seq(t(v))))
            case Op.Gt => out(Op.Gt, Seq(t(v)))
            case Op.GtEq => dec.map(v1 => BoundPred(Op.Gt, pf.fieldId, pf.name, resType, Seq(t(v1))))
              .orElse(out(Op.Gt, Seq(t(v))))
            case Op.NotEq => out(Op.NotEq, Seq(t(v)))
            case Op.NotIn => out(Op.NotIn, p.values.map(t).distinct)
            case _ => None
          }
        }
      case _ => None
    }
  }

  /** startsWith through truncate[w] on strings (inclusive only). */
  private def projectStartsWith(pf: PartitionField, srcType: DataType,
      resType: DataType, v: Any): Option[Expr] = pf.transform match {
    case TruncateTransform(w) if srcType == StringType =>
      val prefix = v.asInstanceOf[String]
      if (prefix.codePointCount(0, prefix.length) < w)
        Some(BoundPred(Op.StartsWith, pf.fieldId, pf.name, resType, Seq(prefix)))
      else
        Some(BoundPred(Op.Eq, pf.fieldId, pf.name, resType,
          Seq(pf.transform.apply(prefix, srcType))))
    case _ => None
  }
}

/** Per-partition residual: the part of a filter not already guaranteed by the
  * partition value (ref `api/.../expressions/ResidualEvaluator.java:109`).
  * If the strict projection is true for this partition ⇒ TRUE (every row
  * matches); if the inclusive projection is false ⇒ FALSE (no row matches);
  * else the predicate must still be applied to rows.
  */
object ResidualEvaluator {
  def residual(spec: PartitionSpec, schema: Schema, expr: Expr,
      partitionValue: Int => Any): Expr = {
    def fold(e: Expr): Expr = e match {
      case TrueExpr => TrueExpr
      case FalseExpr => FalseExpr
      case And(l, r) => (fold(l), fold(r)) match {
        case (FalseExpr, _) | (_, FalseExpr) => FalseExpr
        case (TrueExpr, b) => b
        case (a, TrueExpr) => a
        case (a, b) => And(a, b)
      }
      case Or(l, r) => (fold(l), fold(r)) match {
        case (TrueExpr, _) | (_, TrueExpr) => TrueExpr
        case (FalseExpr, b) => b
        case (a, FalseExpr) => a
        case (a, b) => Or(a, b)
      }
      case Not(c) => fold(c) match {
        case TrueExpr => FalseExpr // every row satisfies c ⇒ none satisfies NOT c
        case FalseExpr =>
          // two-valued NOT is unsound under SQL three-valued logic: c being
          // false for the whole partition may mean "all values null", where
          // NOT c is also false. Only fold to TRUE when the partition proves
          // the column non-null (transforms are null-preserving).
          c match {
            case p: BoundPred =>
              val nn = Projections.strict(spec, schema,
                BoundPred(Op.NotNull, p.fieldId, p.name, p.dataType))
              if (RowEvaluator.eval(nn, partitionValue)) TrueExpr else Not(c)
            case _ => Not(c)
          }
        case b => Not(b)
      }
      case p: Pred => fold(Binder.bind(schema, p))
      case p: BoundPred =>
        val strictP = Projections.strict(spec, schema, p)
        if (RowEvaluator.eval(strictP, partitionValue)) TrueExpr
        else {
          val inclP = Projections.inclusive(spec, schema, p)
          if (!RowEvaluator.eval(inclP, partitionValue)) FalseExpr
          else p
        }
    }
    fold(Exprs.rewriteNot(expr))
  }
}

/** Prunes whole manifests using per-partition-field range summaries
  * (ref `api/.../expressions/ManifestEvaluator.java:77`): evaluate the
  * inclusive partition projection against the summary bounds.
  */
object ManifestEvaluator {
  final case class FieldSummary(containsNull: Boolean,
      containsNan: Option[Boolean], lowerBound: Option[Any], upperBound: Option[Any])

  def eval(spec: PartitionSpec, schema: Schema, rowFilter: Expr,
      summaries: Seq[FieldSummary]): Boolean = {
    if (spec.isUnpartitioned || summaries.isEmpty) return true
    val partExpr = Projections.inclusive(spec, schema, Binder.bind(schema, rowFilter))
    val byId: Map[Int, FieldSummary] =
      spec.fields.map(_.fieldId).zip(summaries).toMap
    val m = new MetricsSource {
      def rowCount: Long = 1L
      def valueCount(id: Int): Option[Long] = None
      def nullCount(id: Int): Option[Long] =
        byId.get(id).flatMap(s => if (!s.containsNull) Some(0L) else None)
      def nanCount(id: Int): Option[Long] =
        byId.get(id).flatMap(_.containsNan).flatMap(c => if (!c) Some(0L) else None)
      def lower(id: Int): Option[Any] = byId.get(id).flatMap(_.lowerBound)
      def upper(id: Int): Option[Any] = byId.get(id).flatMap(_.upperBound)
      override def mayContainNull(id: Int): Boolean = byId.get(id).forall(_.containsNull)
    }
    InclusiveMetricsEvaluator.eval(partExpr, m)
  }
}
