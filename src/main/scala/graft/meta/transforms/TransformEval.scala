package graft.meta.transforms

import java.time.LocalDate

import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Static evaluation helpers for the partition transforms, shared by the
  * Catalyst expressions (both interpreted `nullSafeEval` and generated code —
  * Scala object static forwarders make these directly callable from Janino)
  * and by the driver-side planner.
  *
  * Semantics from the reference (`api/.../transforms/Bucket.java:161-246`,
  * `Truncate.java:88,172,253,357,447`, `Dates.java:49`, `Timestamps.java:50`):
  *  - bucket hash: murmur3_32 of 8-byte little-endian long (int/long/date/
  *    time/timestamp; float/double via doubleToLongBits), UTF-8 bytes
  *    (string), raw bytes (binary/fixed), unscaled big-endian bytes (decimal).
  *  - bucket id: (hash & Int.MaxValue) % n
  *  - truncate: floored (negative-safe) for numerics, first-W-codepoints for
  *    string, first-W-bytes for binary, scaled floor for decimal.
  *  - year/month/day/hour: ordinals since 1970-01-01 UTC.
  */
object TransformEval {
  private final val MICROS_PER_HOUR = 3600L * 1000000L
  private final val MICROS_PER_DAY = 24L * MICROS_PER_HOUR

  // ---- bucket ----
  def bucketLong(n: Int, v: Long): Int =
    (Murmur3.hashLong(v) & Integer.MAX_VALUE) % n
  def bucketInt(n: Int, v: Int): Int = bucketLong(n, v.toLong)
  def bucketDouble(n: Int, v: Double): Int =
    bucketLong(n, java.lang.Double.doubleToLongBits(v))
  def bucketFloat(n: Int, v: Float): Int = bucketDouble(n, v.toDouble)
  def bucketBytes(n: Int, v: Array[Byte]): Int =
    (Murmur3.hashBytes(v) & Integer.MAX_VALUE) % n
  def bucketUtf8(n: Int, v: UTF8String): Int = bucketBytes(n, v.getBytes)
  def bucketDecimal(n: Int, v: Decimal): Int =
    bucketBytes(n, v.toJavaBigDecimal.unscaledValue.toByteArray)

  // ---- truncate ----
  def truncateLong(w: Int, v: Long): Long = v - (((v % w) + w) % w)
  def truncateInt(w: Int, v: Int): Int = v - (((v % w) + w) % w)
  def truncateUtf8(w: Int, v: UTF8String): UTF8String =
    if (v.numChars <= w) v else v.substring(0, w)
  def truncateBytes(w: Int, v: Array[Byte]): Array[Byte] =
    if (v.length <= w) v else java.util.Arrays.copyOf(v, w)
  def truncateDecimal(w: Int, v: Decimal): Decimal = {
    val unscaled = v.toJavaBigDecimal.unscaledValue
    val width = java.math.BigInteger.valueOf(w)
    // floorMod keeps the floor semantics for negative unscaled values
    val truncated = unscaled.subtract(unscaled.mod(width).add(width).mod(width))
    Decimal(new java.math.BigDecimal(truncated, v.scale), v.precision, v.scale)
  }

  // ---- temporal ordinals (inputs are Spark internal reprs: days / micros) ----
  def epochDayFromMicros(micros: Long): Long = Math.floorDiv(micros, MICROS_PER_DAY)

  def yearsFromDays(days: Int): Int =
    LocalDate.ofEpochDay(days.toLong).getYear - 1970
  def monthsFromDays(days: Int): Int = {
    val d = LocalDate.ofEpochDay(days.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
  def yearsFromMicros(micros: Long): Int =
    yearsFromDays(epochDayFromMicros(micros).toInt)
  def monthsFromMicros(micros: Long): Int =
    monthsFromDays(epochDayFromMicros(micros).toInt)
  def daysFromMicros(micros: Long): Int = epochDayFromMicros(micros).toInt
  def hoursFromMicros(micros: Long): Int =
    Math.floorDiv(micros, MICROS_PER_HOUR).toInt
}
