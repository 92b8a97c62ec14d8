package graft.spark

import graft.meta.transforms.TransformEval

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable partition transforms (`SELECT cat.system.bucket(16, id)`),
  * the DSv2 `FunctionCatalog` analogue of the later reference Spark
  * integration's SparkFunctions: lets users route/inspect data with the
  * EXACT function the writer used for hidden partitioning (byte-exact
  * murmur3 bucket, spec truncate, time ordinals), instead of
  * approximating it with `pmod(hash(...))` and getting a different
  * layout. Resolution goes through [[GraftCatalog.loadFunction]] in the
  * `system` (or empty) namespace.
  *
  * Each function binds per input type to a [[ScalarFunction]] whose
  * `produceResult` dispatches to the same static [[TransformEval]] methods
  * the codegen'd Catalyst expressions call — one implementation, three
  * surfaces (writer, Column API, SQL). */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketFunction)
    case "truncate" => Some(TruncateFunction)
    case "years" => Some(timeFunction("years"))
    case "months" => Some(timeFunction("months"))
    case "days" => Some(timeFunction("days"))
    case "hours" => Some(timeFunction("hours"))
    case _ => None
  }

  private def widthType(t: DataType): Boolean = t match {
    case IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private abstract class Scalar2(fnName: String, arg0: DataType, arg1: DataType,
      out: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(arg0, arg1)
    override def resultType(): DataType = out
    override def name(): String = fnName
    override def canonicalName(): String = s"graft.$fnName(${arg1.simpleString})"
    override def isResultNullable: Boolean = true
  }

  private object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): graft/iceberg murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        "bucket takes (numBuckets int, col)")
      require(widthType(inputType.fields(0).dataType),
        s"bucket width must be integral: ${inputType.fields(0).dataType}")
      val t = inputType.fields(1).dataType
      new Scalar2("bucket", IntegerType, t, IntegerType) {
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val n = input.getInt(0)
          t match {
            case IntegerType | DateType => TransformEval.bucketInt(n, input.getInt(1))
            case LongType | TimestampType | TimestampNTZType =>
              TransformEval.bucketLong(n, input.getLong(1))
            case FloatType => TransformEval.bucketFloat(n, input.getFloat(1))
            case DoubleType => TransformEval.bucketDouble(n, input.getDouble(1))
            case StringType => TransformEval.bucketUtf8(n, input.getUTF8String(1))
            case BinaryType => TransformEval.bucketBytes(n, input.getBinary(1))
            case d: DecimalType =>
              TransformEval.bucketDecimal(n, input.getDecimal(1, d.precision, d.scale))
            case other =>
              throw new UnsupportedOperationException(s"Cannot bucket type: $other")
          }
        }
      }
    }
  }

  private object TruncateFunction extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): graft/iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "truncate takes (width int, col)")
      require(widthType(inputType.fields(0).dataType),
        s"truncate width must be integral: ${inputType.fields(0).dataType}")
      val t = inputType.fields(1).dataType
      new Scalar2("truncate", IntegerType, t, t) {
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val w = input.getInt(0)
          t match {
            case IntegerType => TransformEval.truncateInt(w, input.getInt(1))
            case LongType => TransformEval.truncateLong(w, input.getLong(1))
            case StringType => TransformEval.truncateUtf8(w, input.getUTF8String(1))
            case BinaryType => TransformEval.truncateBytes(w, input.getBinary(1))
            case d: DecimalType =>
              TransformEval.truncateDecimal(w, input.getDecimal(1, d.precision, d.scale))
            case other =>
              throw new UnsupportedOperationException(s"Cannot truncate type: $other")
          }
        }
      }
    }
  }

  private def timeFunction(fnName: String): UnboundFunction = new UnboundFunction {
    override def name(): String = fnName
    override def description(): String =
      s"$fnName(col): graft/iceberg time-ordinal transform over date/timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$fnName takes (date|timestamp)")
      val t = inputType.fields(0).dataType
      require(t == DateType || t == TimestampType || t == TimestampNTZType,
        s"$fnName needs a date/timestamp column: $t")
      require(!(fnName == "hours" && t == DateType),
        "hours() is not defined for date")
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = Array(t)
        override def resultType(): DataType = IntegerType
        override def name(): String = fnName
        override def canonicalName(): String = s"graft.$fnName(${t.simpleString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(0)) return null
          (fnName, t) match {
            case ("years", DateType) => TransformEval.yearsFromDays(input.getInt(0))
            case ("years", _) => TransformEval.yearsFromMicros(input.getLong(0))
            case ("months", DateType) => TransformEval.monthsFromDays(input.getInt(0))
            case ("months", _) => TransformEval.monthsFromMicros(input.getLong(0))
            case ("days", DateType) => input.getInt(0)
            case ("days", _) => TransformEval.daysFromMicros(input.getLong(0))
            case ("hours", _) => TransformEval.hoursFromMicros(input.getLong(0))
            case _ => throw new IllegalStateException(fnName)
          }
        }
      }
    }
  }
}
