package graft.expressions

import graft.meta.transforms.TransformEval

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expressions for the hidden-partitioning transforms
  * (ref semantics: `api/.../transforms/` Bucket, Truncate, Dates, Timestamps;
  * ref's own Spark wrappers:
  * `spark3-extensions/.../TransformExpressions.scala:64-132` — but unlike the
  * ref's interpreted `nullSafeEval`-only versions, these generate code via
  * static calls into [[TransformEval]], so they stay inside whole-stage
  * codegen).
  */
private[graft] abstract class TransformExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  protected def evalName: String = "graft.meta.transforms.TransformEval"
}

case class IceBucket(numBuckets: Int, child: Expression) extends TransformExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ice_bucket"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => TransformEval.bucketInt(numBuckets, v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      TransformEval.bucketLong(numBuckets, v.asInstanceOf[Long])
    case FloatType => TransformEval.bucketFloat(numBuckets, v.asInstanceOf[Float])
    case DoubleType => TransformEval.bucketDouble(numBuckets, v.asInstanceOf[Double])
    case StringType =>
      TransformEval.bucketUtf8(numBuckets, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case BinaryType => TransformEval.bucketBytes(numBuckets, v.asInstanceOf[Array[Byte]])
    case _: DecimalType =>
      TransformEval.bucketDecimal(numBuckets, v.asInstanceOf[org.apache.spark.sql.types.Decimal])
    case t => throw new UnsupportedOperationException(s"Cannot bucket type: $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case IntegerType | DateType => "bucketInt"
      case LongType | TimestampType | TimestampNTZType => "bucketLong"
      case FloatType => "bucketFloat"
      case DoubleType => "bucketDouble"
      case StringType => "bucketUtf8"
      case BinaryType => "bucketBytes"
      case _: DecimalType => "bucketDecimal"
      case t => throw new UnsupportedOperationException(s"Cannot bucket type: $t")
    }
    defineCodeGen(ctx, ev, c => s"$evalName.$fn($numBuckets, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IceBucket =
    copy(child = newChild)
}

case class IceTruncate(width: Int, child: Expression) extends TransformExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "ice_truncate"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType => TransformEval.truncateInt(width, v.asInstanceOf[Int])
    case LongType => TransformEval.truncateLong(width, v.asInstanceOf[Long])
    case StringType =>
      TransformEval.truncateUtf8(width, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case BinaryType => TransformEval.truncateBytes(width, v.asInstanceOf[Array[Byte]])
    case _: DecimalType =>
      TransformEval.truncateDecimal(width, v.asInstanceOf[org.apache.spark.sql.types.Decimal])
    case t => throw new UnsupportedOperationException(s"Cannot truncate type: $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case IntegerType => "truncateInt"
      case LongType => "truncateLong"
      case StringType => "truncateUtf8"
      case BinaryType => "truncateBytes"
      case _: DecimalType => "truncateDecimal"
      case t => throw new UnsupportedOperationException(s"Cannot truncate type: $t")
    }
    defineCodeGen(ctx, ev, c => s"$evalName.$fn($width, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IceTruncate =
    copy(child = newChild)
}

/** Base for year/month/day/hour ordinal transforms over date/timestamp. */
private[graft] abstract class TimeOrdinal extends TransformExpression {
  override def dataType: DataType = IntegerType
  protected def fromDays: String
  protected def fromMicros: String

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType =>
      evalDays(v.asInstanceOf[Int])
    case TimestampType | TimestampNTZType =>
      evalMicros(v.asInstanceOf[Long])
    case t => throw new UnsupportedOperationException(s"Cannot apply time transform to: $t")
  }
  protected def evalDays(days: Int): Int
  protected def evalMicros(micros: Long): Int

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType => defineCodeGen(ctx, ev, c => s"$evalName.$fromDays($c)")
      case _ => defineCodeGen(ctx, ev, c => s"$evalName.$fromMicros($c)")
    }
}

case class IceYears(child: Expression) extends TimeOrdinal {
  override def prettyName: String = "ice_years"
  protected def fromDays = "yearsFromDays"
  protected def fromMicros = "yearsFromMicros"
  protected def evalDays(days: Int): Int = TransformEval.yearsFromDays(days)
  protected def evalMicros(micros: Long): Int = TransformEval.yearsFromMicros(micros)
  override protected def withNewChildInternal(newChild: Expression): IceYears =
    copy(child = newChild)
}

case class IceMonths(child: Expression) extends TimeOrdinal {
  override def prettyName: String = "ice_months"
  protected def fromDays = "monthsFromDays"
  protected def fromMicros = "monthsFromMicros"
  protected def evalDays(days: Int): Int = TransformEval.monthsFromDays(days)
  protected def evalMicros(micros: Long): Int = TransformEval.monthsFromMicros(micros)
  override protected def withNewChildInternal(newChild: Expression): IceMonths =
    copy(child = newChild)
}

case class IceDays(child: Expression) extends TimeOrdinal {
  override def prettyName: String = "ice_days"
  protected def fromDays = "identityDays"
  protected def fromMicros = "daysFromMicros"
  protected def evalDays(days: Int): Int = days
  protected def evalMicros(micros: Long): Int = TransformEval.daysFromMicros(micros)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType => defineCodeGen(ctx, ev, c => c)
      case _ => defineCodeGen(ctx, ev, c => s"$evalName.$fromMicros($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): IceDays =
    copy(child = newChild)
}

case class IceHours(child: Expression) extends TimeOrdinal {
  override def prettyName: String = "ice_hours"
  protected def fromDays = "" // hours over date is not defined in the spec
  protected def fromMicros = "hoursFromMicros"
  protected def evalDays(days: Int): Int =
    throw new UnsupportedOperationException("hours() is not defined for date")
  protected def evalMicros(micros: Long): Int = TransformEval.hoursFromMicros(micros)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$evalName.$fromMicros($c)")
  override protected def withNewChildInternal(newChild: Expression): IceHours =
    copy(child = newChild)
}
