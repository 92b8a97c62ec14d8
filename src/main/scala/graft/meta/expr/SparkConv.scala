package graft.meta.expr

import graft.meta.Schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.{col, isnan, lit, not}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Lowers the predicate ADT to Spark `Column`s so row-level filtering runs
  * inside Catalyst/codegen (the engine-side half of ref `Evaluator.java` —
  * we never evaluate rows on the driver). */
object SparkConv {

  def toColumn(expr: Expr, schema: Schema): Column = expr match {
    case TrueExpr => lit(true)
    case FalseExpr => lit(false)
    case And(l, r) => toColumn(l, schema) && toColumn(r, schema)
    case Or(l, r) => toColumn(l, schema) || toColumn(r, schema)
    case Not(c) => not(toColumn(c, schema))
    case Pred(op, column, values) =>
      toColumn(Binder.bind(schema, Pred(op, column, values)), schema)
    case BoundPred(op, id, name, t, values) =>
      val c = col(name)
      def l(v: Any): Column = internalLit(v, t)
      op match {
        case Op.IsNull => c.isNull
        case Op.NotNull => c.isNotNull
        case Op.IsNan => isnan(c)
        case Op.NotNan => !isnan(c)
        case Op.Lt => c < l(values.head)
        case Op.LtEq => c <= l(values.head)
        case Op.Gt => c > l(values.head)
        case Op.GtEq => c >= l(values.head)
        case Op.Eq => c === l(values.head)
        case Op.NotEq => c =!= l(values.head)
        case Op.In => c.isin(values.map(v => internalToExternal(v, t)): _*)
        case Op.NotIn => !c.isin(values.map(v => internalToExternal(v, t)): _*)
        case Op.StartsWith => c.startsWith(values.head.asInstanceOf[String])
      }
  }

  /** Catalyst-internal value from an internal-repr value. */
  def catalystValue(v: Any, t: DataType): Any = (v, t) match {
    case (s: String, StringType) => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case (d: java.math.BigDecimal, dt: DecimalType) =>
      org.apache.spark.sql.types.Decimal(d, dt.precision, dt.scale)
    case (other, _) => other
  }

  /** Catalyst literal from an internal-repr value. */
  def internalLit(v: Any, t: DataType): Column =
    ColumnBridge.column(Literal(catalystValue(v, t), t))

  /** External (Scala) value for APIs that take plain values (isin). */
  def internalToExternal(v: Any, t: DataType): Any = (v, t) match {
    case (days: Int, DateType) => java.time.LocalDate.ofEpochDay(days.toLong)
    case (micros: Long, TimestampType) =>
      java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L)
    case (micros: Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (other, _) => other
  }
}
