package graft.spark

import graft.meta.transforms.TransformEval

import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
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
  * Every bound function exposes the V2 MAGIC method (`invoke` with exact
  * internal argument types), so Spark plans it as a codegen'd `Invoke`
  * instead of the row-boxing `produceResult` path — which stays as the
  * documented fallback. Both dispatch to the same static
  * [[TransformEval]] methods the Catalyst transform expressions call: one
  * implementation, three surfaces (writer, Column API, SQL). */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  /** Width-baked single-arg truncate, served for SPJ partitioning reports:
    * Spark's key-grouped machinery only admits transform expressions with
    * ONE reference child (`KeyGroupedPartitioning.supportsExpressions`), so
    * the two-arg `truncate(width, col)` cannot key a storage-partitioned
    * join — the scan reports `truncate_<w>(col)` instead, with the width in
    * the NAME (and thus in `canonicalName`: mismatched widths must never
    * compare compatible). */
  private val TruncFixedRe = "truncate_(\\d+)".r

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years" => Some(new TimeUnbound("years"))
    case "months" => Some(new TimeUnbound("months"))
    case "days" => Some(new TimeUnbound("days"))
    case "hours" => Some(new TimeUnbound("hours"))
    case TruncFixedRe(w) if w.toInt > 0 => Some(new TruncateFixedUnbound(w.toInt))
    case _ => None
  }

  private def requireIntegral(t: DataType, what: String): Unit = t match {
    case IntegerType | ShortType | ByteType => ()
    case other => throw new UnsupportedOperationException(
      s"$what width must be integral, got: ${other.simpleString}")
  }

  /** Reduces a bucket ordinal into a COARSER bucket space: with M | N,
    * `((h & MaxInt) % N) % M == (h & MaxInt) % M`, so the finer side's
    * stored ordinals map exactly onto the coarser side's. Serializable —
    * Spark ships it inside the SPJ partition-grouping closure. */
  final case class BucketModReducer(coarser: Int)
      extends Reducer[Int, Int] with Serializable {
    override def reduce(ordinal: Int): Int = ordinal % coarser
  }

  /** Spark's compatible-transform SPJ hook
    * (`spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled`):
    * a bucket(N) scan joins a bucket(M) scan with NO exchange when M
    * divides N — Spark asks the FINER function for a reducer into the
    * coarser key space and regroups that side's partitions by reduced key
    * (each bucket(N) ordinal maps to exactly one bucket(M) ordinal). At
    * 100 TB co-bucketed-but-differently-sized table pairs are the common
    * large-join shape, so this removes the full both-sides exchange the
    * equal-count fence previously required. Returns null (not reducible)
    * when the other side is not a graft bucket function or the counts
    * don't nest — Spark then falls back to the exchange plan. */
  trait BucketReducible extends ReducibleFunction[Int, Int] {
    override def reducer(thisNumBuckets: Int, other: ReducibleFunction[_, _],
        otherNumBuckets: Int): Reducer[Int, Int] =
      if (other.isInstanceOf[BucketReducible] && otherNumBuckets > 0 &&
          thisNumBuckets > otherNumBuckets &&
          thisNumBuckets % otherNumBuckets == 0) BucketModReducer(otherNumBuckets)
      else null
  }

  abstract class GraftScalar(fnName: String, in: Array[DataType], out: DataType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = in
    override def resultType(): DataType = out
    override def name(): String = fnName
    override def canonicalName(): String =
      s"graft.$fnName(${in.map(_.simpleString).mkString(",")})"
    override def isResultNullable: Boolean = true
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): graft/iceberg murmur3 bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "bucket takes (numBuckets int, col)")
      requireIntegral(inputType.fields(0).dataType, "bucket")
      inputType.fields(1).dataType match {
        case IntegerType | DateType => new BucketIntFn(inputType.fields(1).dataType)
        case LongType | TimestampType | TimestampNTZType =>
          new BucketLongFn(inputType.fields(1).dataType)
        case FloatType => new BucketFloatFn
        case DoubleType => new BucketDoubleFn
        case StringType => new BucketStringFn
        case BinaryType => new BucketBinaryFn
        case d: DecimalType => new BucketDecimalFn(d)
        case other =>
          throw new UnsupportedOperationException(s"Cannot bucket type: $other")
      }
    }
  }

  final class BucketIntFn(t: DataType)
      extends GraftScalar("bucket", Array(IntegerType, t), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Int): Int = TransformEval.bucketInt(n, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getInt(1))
  }
  final class BucketLongFn(t: DataType)
      extends GraftScalar("bucket", Array(IntegerType, t), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Long): Int = TransformEval.bucketLong(n, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getLong(1))
  }
  final class BucketFloatFn
      extends GraftScalar("bucket", Array(IntegerType, FloatType), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Float): Int = TransformEval.bucketFloat(n, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getFloat(1))
  }
  final class BucketDoubleFn
      extends GraftScalar("bucket", Array(IntegerType, DoubleType), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Double): Int = TransformEval.bucketDouble(n, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getDouble(1))
  }
  // Reference-typed magic args (UTF8String/Array[Byte]/Decimal) are NOT
  // auto-null-checked by Spark's Invoke (propagateNull=false; only
  // primitive args get a guard), so these null-check inside invoke and
  // return a boxed result.
  final class BucketStringFn
      extends GraftScalar("bucket", Array(IntegerType, StringType), IntegerType) with BucketReducible {
    def invoke(n: Int, v: UTF8String): Integer =
      if (v == null) null else Integer.valueOf(TransformEval.bucketUtf8(n, v))
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getUTF8String(1))
  }
  final class BucketBinaryFn
      extends GraftScalar("bucket", Array(IntegerType, BinaryType), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Array[Byte]): Integer =
      if (v == null) null else Integer.valueOf(TransformEval.bucketBytes(n, v))
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getBinary(1))
  }
  final class BucketDecimalFn(d: DecimalType)
      extends GraftScalar("bucket", Array(IntegerType, d), IntegerType) with BucketReducible {
    def invoke(n: Int, v: Decimal): Integer =
      if (v == null) null else Integer.valueOf(TransformEval.bucketDecimal(n, v))
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null
      else invoke(r.getInt(0), r.getDecimal(1, d.precision, d.scale))
  }

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): graft/iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "truncate takes (width int, col)")
      requireIntegral(inputType.fields(0).dataType, "truncate")
      inputType.fields(1).dataType match {
        case IntegerType => new TruncateIntFn
        case LongType => new TruncateLongFn
        case StringType => new TruncateStringFn
        case BinaryType => new TruncateBinaryFn
        case d: DecimalType => new TruncateDecimalFn(d)
        case other =>
          throw new UnsupportedOperationException(s"Cannot truncate type: $other")
      }
    }
  }

  final class TruncateIntFn
      extends GraftScalar("truncate", Array(IntegerType, IntegerType), IntegerType) {
    def invoke(w: Int, v: Int): Int = TransformEval.truncateInt(w, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getInt(1))
  }
  final class TruncateLongFn
      extends GraftScalar("truncate", Array(IntegerType, LongType), LongType) {
    def invoke(w: Int, v: Long): Long = TransformEval.truncateLong(w, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getLong(1))
  }
  final class TruncateStringFn
      extends GraftScalar("truncate", Array(IntegerType, StringType), StringType) {
    def invoke(w: Int, v: UTF8String): UTF8String =
      if (v == null) null else TransformEval.truncateUtf8(w, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getUTF8String(1))
  }
  final class TruncateBinaryFn
      extends GraftScalar("truncate", Array(IntegerType, BinaryType), BinaryType) {
    def invoke(w: Int, v: Array[Byte]): Array[Byte] =
      if (v == null) null else TransformEval.truncateBytes(w, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null else invoke(r.getInt(0), r.getBinary(1))
  }
  final class TruncateFixedUnbound(w: Int) extends UnboundFunction {
    override def name(): String = s"truncate_$w"
    override def description(): String =
      s"truncate_$w(col): graft/iceberg truncate[$w] transform (width-baked " +
        "single-arg form for storage-partitioned joins)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"truncate_$w takes one column")
      inputType.fields(0).dataType match {
        case t @ (IntegerType | LongType | StringType | BinaryType |
            _: DecimalType) => new TruncateFixedFn(w, t)
        case other =>
          throw new UnsupportedOperationException(s"Cannot truncate type: $other")
      }
    }
  }

  /** Same evaluation as the two-arg truncate functions (TransformEval is
    * the single source of truth), width captured at bind. */
  final class TruncateFixedFn(w: Int, dt: DataType)
      extends GraftScalar(s"truncate_$w", Array(dt), dt) {
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0)) null else dt match {
        case IntegerType => TransformEval.truncateInt(w, r.getInt(0))
        case LongType => TransformEval.truncateLong(w, r.getLong(0))
        case StringType => TransformEval.truncateUtf8(w, r.getUTF8String(0))
        case BinaryType => TransformEval.truncateBytes(w, r.getBinary(0))
        case d: DecimalType =>
          TransformEval.truncateDecimal(w, r.getDecimal(0, d.precision, d.scale))
        case other =>
          throw new IllegalStateException(s"unreachable: $other")
      }
  }

  final class TruncateDecimalFn(d: DecimalType)
      extends GraftScalar("truncate", Array(IntegerType, d), d) {
    def invoke(w: Int, v: Decimal): Decimal =
      if (v == null) null else TransformEval.truncateDecimal(w, v)
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0) || r.isNullAt(1)) null
      else invoke(r.getInt(0), r.getDecimal(1, d.precision, d.scale))
  }

  final class TimeUnbound(fnName: String) extends UnboundFunction {
    override def name(): String = fnName
    override def description(): String =
      s"$fnName(col): graft/iceberg time-ordinal transform over date/timestamp"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$fnName takes (date|timestamp)")
      inputType.fields(0).dataType match {
        case DateType if fnName == "hours" =>
          throw new UnsupportedOperationException("hours() is not defined for date")
        case DateType => new TimeDaysFn(fnName)
        case t @ (TimestampType | TimestampNTZType) => new TimeMicrosFn(fnName, t)
        case other => throw new UnsupportedOperationException(
          s"$fnName needs a date/timestamp column: $other")
      }
    }
  }

  final class TimeDaysFn(fnName: String)
      extends GraftScalar(fnName, Array(DateType), IntegerType) {
    def invoke(days: Int): Int = fnName match {
      case "years" => TransformEval.yearsFromDays(days)
      case "months" => TransformEval.monthsFromDays(days)
      case _ => days // "days": identity on the date ordinal
    }
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0)) null else invoke(r.getInt(0))
  }
  final class TimeMicrosFn(fnName: String, t: DataType)
      extends GraftScalar(fnName, Array(t), IntegerType) {
    def invoke(micros: Long): Int = fnName match {
      case "years" => TransformEval.yearsFromMicros(micros)
      case "months" => TransformEval.monthsFromMicros(micros)
      case "days" => TransformEval.daysFromMicros(micros)
      case _ => TransformEval.hoursFromMicros(micros)
    }
    override def produceResult(r: InternalRow): Any =
      if (r.isNullAt(0)) null else invoke(r.getLong(0))
  }
}
