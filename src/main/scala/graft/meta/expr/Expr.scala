package graft.meta.expr

import graft.meta.Schema

import org.apache.spark.sql.types._

/** Predicate algebra (ref `api/.../expressions/Expression.java:27-46`,
  * `Expressions.java`): an engine-independent ADT used for metadata pruning.
  * Data-level filtering lowers the same tree to Spark `Column`s
  * ([[SparkConv]]) so Catalyst executes it codegen'd.
  */
sealed trait Op
object Op {
  case object IsNull extends Op
  case object NotNull extends Op
  case object IsNan extends Op
  case object NotNan extends Op
  case object Lt extends Op
  case object LtEq extends Op
  case object Gt extends Op
  case object GtEq extends Op
  case object Eq extends Op
  case object NotEq extends Op
  case object In extends Op
  case object NotIn extends Op
  case object StartsWith extends Op

  /** ref `Expression.java negate()` */
  def negate(op: Op): Option[Op] = op match {
    case IsNull => Some(NotNull)
    case NotNull => Some(IsNull)
    case IsNan => Some(NotNan)
    case NotNan => Some(IsNan)
    case Lt => Some(GtEq)
    case LtEq => Some(Gt)
    case Gt => Some(LtEq)
    case GtEq => Some(Lt)
    case Eq => Some(NotEq)
    case NotEq => Some(Eq)
    case In => Some(NotIn)
    case NotIn => Some(In)
    case StartsWith => None // no NOT_STARTS_WITH in the v1 algebra
  }
}

sealed trait Expr extends Serializable
case object TrueExpr extends Expr
case object FalseExpr extends Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr
/** Unbound predicate on a column name; `values` are Scala-side literals. */
final case class Pred(op: Op, column: String, values: Seq[Any] = Nil) extends Expr

/** Bound predicate: resolved to a field ID + source type, literals converted
  * to internal representation (date=days Int, timestamp=micros Long,
  * decimal=java BigDecimal). */
final case class BoundPred(op: Op, fieldId: Int, name: String,
    dataType: DataType, values: Seq[Any] = Nil) extends Expr

/** Builder DSL mirroring ref `Expressions.java`. */
object Exprs {
  def alwaysTrue: Expr = TrueExpr
  def alwaysFalse: Expr = FalseExpr
  def and(l: Expr, r: Expr): Expr = And(l, r)
  def and(l: Expr, r: Expr, rest: Expr*): Expr = rest.foldLeft(And(l, r): Expr)(And(_, _))
  def or(l: Expr, r: Expr): Expr = Or(l, r)
  def not(e: Expr): Expr = Not(e)
  def isNull(c: String): Expr = Pred(Op.IsNull, c)
  def notNull(c: String): Expr = Pred(Op.NotNull, c)
  def isNaN(c: String): Expr = Pred(Op.IsNan, c)
  def notNaN(c: String): Expr = Pred(Op.NotNan, c)
  def lessThan(c: String, v: Any): Expr = Pred(Op.Lt, c, Seq(v))
  def lessThanOrEqual(c: String, v: Any): Expr = Pred(Op.LtEq, c, Seq(v))
  def greaterThan(c: String, v: Any): Expr = Pred(Op.Gt, c, Seq(v))
  def greaterThanOrEqual(c: String, v: Any): Expr = Pred(Op.GtEq, c, Seq(v))
  def equalTo(c: String, v: Any): Expr = Pred(Op.Eq, c, Seq(v))
  def notEqualTo(c: String, v: Any): Expr = Pred(Op.NotEq, c, Seq(v))
  def in(c: String, vs: Any*): Expr = Pred(Op.In, c, vs)
  def notIn(c: String, vs: Any*): Expr = Pred(Op.NotIn, c, vs)
  def startsWith(c: String, prefix: String): Expr = Pred(Op.StartsWith, c, Seq(prefix))

  /** Push NOT down via De Morgan + op negation (ref `RewriteNot.java`). */
  def rewriteNot(e: Expr): Expr = e match {
    case Not(TrueExpr) => FalseExpr
    case Not(FalseExpr) => TrueExpr
    case Not(Not(c)) => rewriteNot(c)
    case Not(And(l, r)) => Or(rewriteNot(Not(l)), rewriteNot(Not(r)))
    case Not(Or(l, r)) => And(rewriteNot(Not(l)), rewriteNot(Not(r)))
    case Not(p: Pred) => Op.negate(p.op) match {
      case Some(neg) => Pred(neg, p.column, p.values)
      case None => Not(p)
    }
    case Not(p: BoundPred) => Op.negate(p.op) match {
      case Some(neg) => p.copy(op = neg)
      case None => Not(p)
    }
    case And(l, r) => And(rewriteNot(l), rewriteNot(r))
    case Or(l, r) => Or(rewriteNot(l), rewriteNot(r))
    case other => other
  }
}

/** Out-of-range literal sentinels (ref `Literals.java` ABOVE_MAX/BELOW_MIN).
  * Folded away during binding, never seen by evaluators. */
private[expr] case object AboveMax
private[expr] case object BelowMin

/** Binds column names to field IDs against a schema and converts literals to
  * the column's internal type (ref `api/.../expressions/Binder.java:59`,
  * `Literals.java:230-375`). Out-of-range literals fold to TRUE/FALSE.
  */
object Binder {
  def bind(schema: Schema, expr: Expr, caseSensitive: Boolean = false): Expr =
    Exprs.rewriteNot(expr) match {
      case e => bind0(schema, e, caseSensitive)
    }

  private def bind0(schema: Schema, expr: Expr, cs: Boolean): Expr = expr match {
    case TrueExpr => TrueExpr
    case FalseExpr => FalseExpr
    case And(l, r) => (bind0(schema, l, cs), bind0(schema, r, cs)) match {
      case (FalseExpr, _) | (_, FalseExpr) => FalseExpr
      case (TrueExpr, b) => b
      case (a, TrueExpr) => a
      case (a, b) => And(a, b)
    }
    case Or(l, r) => (bind0(schema, l, cs), bind0(schema, r, cs)) match {
      case (TrueExpr, _) | (_, TrueExpr) => TrueExpr
      case (FalseExpr, b) => b
      case (a, FalseExpr) => a
      case (a, b) => Or(a, b)
    }
    case Not(c) => bind0(schema, c, cs) match {
      case TrueExpr => FalseExpr
      case FalseExpr => TrueExpr
      case b => Not(b)
    }
    case p: BoundPred => p
    case Pred(op, column, values) =>
      val id = schema.fieldId(column)
      val field = schema.idToField(id)
      val t = field.dataType
      op match {
        case Op.IsNull =>
          if (!field.nullable) FalseExpr else BoundPred(op, id, field.name, t)
        case Op.NotNull =>
          if (!field.nullable) TrueExpr else BoundPred(op, id, field.name, t)
        case Op.IsNan | Op.NotNan =>
          require(t == FloatType || t == DoubleType, s"$op requires float/double: $column")
          BoundPred(op, id, field.name, t)
        case Op.In | Op.NotIn =>
          val conv = values.map(Literals.convert(_, t))
          val inRange = conv.filter(v => v != AboveMax && v != BelowMin).distinct
          if (inRange.isEmpty) { if (op == Op.In) FalseExpr else TrueExpr }
          else BoundPred(op, id, field.name, t, inRange)
        case Op.StartsWith =>
          require(t == StringType, s"startsWith requires string: $column")
          BoundPred(op, id, field.name, t, values)
        case Op.Lt | Op.LtEq =>
          Literals.convert(values.head, t) match {
            case AboveMax => TrueExpr
            case BelowMin => FalseExpr
            case v => BoundPred(op, id, field.name, t, Seq(v))
          }
        case Op.Gt | Op.GtEq =>
          Literals.convert(values.head, t) match {
            case AboveMax => FalseExpr
            case BelowMin => TrueExpr
            case v => BoundPred(op, id, field.name, t, Seq(v))
          }
        case Op.Eq =>
          Literals.convert(values.head, t) match {
            case AboveMax | BelowMin => FalseExpr
            case v => BoundPred(op, id, field.name, t, Seq(v))
          }
        case Op.NotEq =>
          Literals.convert(values.head, t) match {
            case AboveMax | BelowMin => TrueExpr
            case v => BoundPred(op, id, field.name, t, Seq(v))
          }
      }
  }
}

/** Literal conversion to internal representations + type-aware comparison
  * (ref `Literals.java`, `types/Comparators.java`). */
object Literals {
  import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

  /** Convert an external literal to `t`'s internal repr, or Above/BelowMin. */
  def convert(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (i: Int, IntegerType) => i
    case (l: Long, IntegerType) =>
      if (l > Int.MaxValue) AboveMax else if (l < Int.MinValue) BelowMin else l.toInt
    case (i: Int, LongType) => i.toLong
    case (l: Long, LongType) => l
    case (i: Int, FloatType) => i.toFloat
    case (l: Long, FloatType) => l.toFloat
    case (f: Float, FloatType) => f
    case (d: Double, FloatType) =>
      if (d > Float.MaxValue) AboveMax
      else if (d < Float.MinValue) BelowMin
      else d.toFloat
    case (n: Number, DoubleType) => n.doubleValue()
    case (s: String, StringType) => s
    case (b: Boolean, BooleanType) => b
    case (b: Array[Byte], BinaryType) => b
    // dates → epoch days
    case (i: Int, DateType) => i
    case (s: String, DateType) => LocalDate.parse(s).toEpochDay.toInt
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    // timestamps → epoch micros (UTC)
    case (l: Long, TimestampType | TimestampNTZType) => l
    case (s: String, TimestampType | TimestampNTZType) =>
      val ldt = try LocalDateTime.parse(s.replace(' ', 'T'))
      catch { case _: Exception => LocalDate.parse(s).atStartOfDay() }
      ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000L
    case (ts: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    case (i: Instant, TimestampType | TimestampNTZType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (d: java.math.BigDecimal, dt: DecimalType) =>
      require(d.scale == dt.scale, s"Cannot convert decimal scale ${d.scale} to ${dt.scale}")
      d
    case (d: BigDecimal, dt: DecimalType) => convert(d.bigDecimal, dt)
    case (i: Int, dt: DecimalType) =>
      new java.math.BigDecimal(i).setScale(dt.scale)
    case (l: Long, dt: DecimalType) =>
      new java.math.BigDecimal(l).setScale(dt.scale)
    case (d: Double, dt: DecimalType) =>
      java.math.BigDecimal.valueOf(d).setScale(dt.scale, java.math.RoundingMode.HALF_UP)
    case (other, tt) =>
      throw new IllegalArgumentException(s"Cannot convert literal $other (${other.getClass}) to $tt")
  }

  /** Convert a Spark external-row value (from collect()) to internal repr. */
  def toInternal(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: LocalDate, DateType) => d.toEpochDay.toInt
    case (ts: java.sql.Timestamp, _) => ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    case (i: Instant, _) => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (ldt: LocalDateTime, _) =>
      ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L + ldt.getNano / 1000L
    case (d: java.math.BigDecimal, _) => d
    case (d: BigDecimal, _) => d.bigDecimal
    case (u: org.apache.spark.unsafe.types.UTF8String, _) => u.toString
    case (other, _) => other
  }

  /** Compare two internal-repr values of type `t` (nulls not allowed).
    * Strings/binary compare by unsigned byte order — matching how bounds are
    * collected (Spark min/max = UTF8String binary order; ref
    * `Comparators.java` unsigned comparison). */
  def compare(t: DataType, a: Any, b: Any): Int = t match {
    case IntegerType | DateType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => compareBytes(
      a.asInstanceOf[String].getBytes("UTF-8"), b.asInstanceOf[String].getBytes("UTF-8"))
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case BinaryType => compareBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _: DecimalType =>
      a.asInstanceOf[java.math.BigDecimal].compareTo(b.asInstanceOf[java.math.BigDecimal])
    case other => throw new IllegalArgumentException(s"No comparator for $other")
  }

  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  def isNaN(v: Any): Boolean = v match {
    case d: Double => d.isNaN
    case f: Float => f.isNaN
    case _ => false
  }

  /** Discrete predecessor/successor in internal space, where defined —
    * used by inclusive/strict projection boundary shifts
    * (ref `ProjectionUtil.java:43-127`). */
  def decrement(t: DataType, v: Any): Option[Any] = t match {
    case IntegerType | DateType => Some(v.asInstanceOf[Int] - 1)
    case LongType | TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long] - 1L)
    case dt: DecimalType =>
      val d = v.asInstanceOf[java.math.BigDecimal]
      Some(d.subtract(new java.math.BigDecimal(java.math.BigInteger.ONE, dt.scale)))
    case _ => None
  }
  def increment(t: DataType, v: Any): Option[Any] = t match {
    case IntegerType | DateType => Some(v.asInstanceOf[Int] + 1)
    case LongType | TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long] + 1L)
    case dt: DecimalType =>
      val d = v.asInstanceOf[java.math.BigDecimal]
      Some(d.add(new java.math.BigDecimal(java.math.BigInteger.ONE, dt.scale)))
    case _ => None
  }
}
