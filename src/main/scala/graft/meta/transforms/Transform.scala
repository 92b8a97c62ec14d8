package graft.meta.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Meta-level partition transforms (ref `api/.../transforms/`): pure value
  * functions over Spark *internal* representations (date = epoch days Int,
  * timestamp = epoch micros Long, decimal = java BigDecimal, string = String,
  * binary = Array[Byte]) plus Column lowering via graft's Catalyst
  * expressions. Predicate projection lives in
  * [[graft.meta.expr.Projections]].
  */
sealed trait Transform extends Serializable {
  def name: String
  def apply(value: Any, sourceType: DataType): Any
  def resultType(sourceType: DataType): DataType
  def toColumn(c: Column, sourceType: DataType): Column
  def canTransform(sourceType: DataType): Boolean
  /** Ordinal-monotonic transforms preserve ordering of the source values —
    * range predicates project through them (truncate, year/month/day/hour,
    * identity). Bucket does not. */
  def preservesOrder: Boolean
  /** Human-readable partition directory column name for a source column. */
  def columnName(sourceName: String): String
}

object Transform {
  /** Parse a transform spec string: identity, void, bucket[N], truncate[W],
    * year, month, day, hour. */
  def parse(s: String): Transform = {
    val bucketRe = "bucket\\[(\\d+)\\]".r
    val truncRe = "truncate\\[(\\d+)\\]".r
    s.trim.toLowerCase match {
      case "identity" => IdentityTransform
      case "void" => VoidTransform
      case "year" | "years" => YearTransform
      case "month" | "months" => MonthTransform
      case "day" | "days" | "date" => DayTransform
      case "hour" | "hours" => HourTransform
      case bucketRe(n) => BucketTransform(n.toInt)
      case truncRe(w) => TruncateTransform(w.toInt)
      case other => UnknownTransform(other)
    }
  }
}

/** Forward-compat passthrough (ref `api/.../transforms/UnknownTransform.java`):
  * a table written by a NEWER writer with a transform this version doesn't
  * know must still be readable. Projections return non-projectable for it
  * (inclusive ⇒ TRUE, strict ⇒ FALSE), so scans keep every file in such
  * partitions and re-filter rows; only WRITING through it fails. */
final case class UnknownTransform(raw: String) extends Transform {
  def name: String = raw
  def apply(value: Any, sourceType: DataType): Any =
    throw new UnsupportedOperationException(s"Cannot evaluate unknown transform: $raw")
  def resultType(sourceType: DataType): DataType = StringType
  def toColumn(c: Column, sourceType: DataType): Column =
    throw new UnsupportedOperationException(s"Cannot write with unknown transform: $raw")
  def canTransform(sourceType: DataType): Boolean = true
  def preservesOrder: Boolean = false
  def columnName(sourceName: String): String = s"${sourceName}_$raw"
}

case object IdentityTransform extends Transform {
  def name = "identity"
  def apply(value: Any, sourceType: DataType): Any = value
  def resultType(sourceType: DataType): DataType = sourceType
  def toColumn(c: Column, sourceType: DataType): Column = c
  def canTransform(sourceType: DataType): Boolean = true
  def preservesOrder = true
  def columnName(sourceName: String): String = sourceName
}

case object VoidTransform extends Transform {
  def name = "void"
  def apply(value: Any, sourceType: DataType): Any = null
  def resultType(sourceType: DataType): DataType = sourceType
  def toColumn(c: Column, sourceType: DataType): Column =
    org.apache.spark.sql.functions.lit(null).cast(sourceType)
  def canTransform(sourceType: DataType): Boolean = true
  def preservesOrder = false
  def columnName(sourceName: String): String = s"${sourceName}_null"
}

final case class BucketTransform(numBuckets: Int) extends Transform {
  require(numBuckets > 0, s"Invalid number of buckets: $numBuckets")
  def name = s"bucket[$numBuckets]"
  def apply(value: Any, sourceType: DataType): Any = if (value == null) null else {
    sourceType match {
      case IntegerType | DateType => TransformEval.bucketInt(numBuckets, value.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        TransformEval.bucketLong(numBuckets, value.asInstanceOf[Long])
      case StringType => TransformEval.bucketBytes(numBuckets,
        value.asInstanceOf[String].getBytes("UTF-8"))
      case BinaryType => TransformEval.bucketBytes(numBuckets, value.asInstanceOf[Array[Byte]])
      case _: DecimalType => TransformEval.bucketBytes(numBuckets,
        value.asInstanceOf[java.math.BigDecimal].unscaledValue.toByteArray)
      case t => throw new UnsupportedOperationException(s"Cannot bucket type: $t")
    }
  }
  def resultType(sourceType: DataType): DataType = IntegerType
  def toColumn(c: Column, sourceType: DataType): Column =
    graft.functions.ice_bucket(numBuckets, c)
  def canTransform(t: DataType): Boolean = t match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }
  def preservesOrder = false
  def columnName(sourceName: String): String = s"${sourceName}_bucket"
}

final case class TruncateTransform(width: Int) extends Transform {
  require(width > 0, s"Invalid truncate width: $width")
  def name = s"truncate[$width]"
  def apply(value: Any, sourceType: DataType): Any = if (value == null) null else {
    sourceType match {
      case IntegerType => TransformEval.truncateInt(width, value.asInstanceOf[Int])
      case LongType => TransformEval.truncateLong(width, value.asInstanceOf[Long])
      case StringType =>
        val s = value.asInstanceOf[String]
        if (s.codePointCount(0, s.length) <= width) s
        else s.substring(0, s.offsetByCodePoints(0, width))
      case BinaryType => TransformEval.truncateBytes(width, value.asInstanceOf[Array[Byte]])
      case dt: DecimalType =>
        val d = value.asInstanceOf[java.math.BigDecimal]
        TransformEval.truncateDecimal(width, Decimal(d)).toJavaBigDecimal
      case t => throw new UnsupportedOperationException(s"Cannot truncate type: $t")
    }
  }
  def resultType(sourceType: DataType): DataType = sourceType
  def toColumn(c: Column, sourceType: DataType): Column =
    graft.functions.ice_truncate(width, c)
  def canTransform(t: DataType): Boolean = t match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }
  def preservesOrder = true
  def columnName(sourceName: String): String = s"${sourceName}_trunc"
}

sealed abstract class TimeTransform(val name: String) extends Transform {
  protected def fromDays(days: Int): Int
  protected def fromMicros(micros: Long): Int
  def apply(value: Any, sourceType: DataType): Any = if (value == null) null else {
    sourceType match {
      case DateType => fromDays(value.asInstanceOf[Int])
      case TimestampType | TimestampNTZType => fromMicros(value.asInstanceOf[Long])
      case t => throw new UnsupportedOperationException(s"Cannot apply $name to: $t")
    }
  }
  def resultType(sourceType: DataType): DataType = IntegerType
  def canTransform(t: DataType): Boolean = t match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  def preservesOrder = true
  def columnName(sourceName: String): String = s"${sourceName}_$name"
}

case object YearTransform extends TimeTransform("year") {
  protected def fromDays(days: Int): Int = TransformEval.yearsFromDays(days)
  protected def fromMicros(micros: Long): Int = TransformEval.yearsFromMicros(micros)
  def toColumn(c: Column, sourceType: DataType): Column = graft.functions.ice_years(c)
}
case object MonthTransform extends TimeTransform("month") {
  protected def fromDays(days: Int): Int = TransformEval.monthsFromDays(days)
  protected def fromMicros(micros: Long): Int = TransformEval.monthsFromMicros(micros)
  def toColumn(c: Column, sourceType: DataType): Column = graft.functions.ice_months(c)
}
case object DayTransform extends TimeTransform("day") {
  protected def fromDays(days: Int): Int = days
  protected def fromMicros(micros: Long): Int = TransformEval.daysFromMicros(micros)
  def toColumn(c: Column, sourceType: DataType): Column = graft.functions.ice_days(c)
}
case object HourTransform extends TimeTransform("hour") {
  protected def fromDays(days: Int): Int =
    throw new UnsupportedOperationException("hours() is not defined for date")
  protected def fromMicros(micros: Long): Int = TransformEval.hoursFromMicros(micros)
  def toColumn(c: Column, sourceType: DataType): Column = graft.functions.ice_hours(c)
}
