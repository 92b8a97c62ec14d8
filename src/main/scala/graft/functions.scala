package graft

import graft.expressions.{IceBucket, IceDays, IceHours, IceMonths, IceTruncate, IceYears}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge

/** Public Column API for graft's partition transforms (mirrors the surface the
  * reference registers via `IcebergSpark.registerBucketUDF` and its Catalyst
  * transform expressions, but codegen-enabled).
  */
object functions {
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Iceberg-spec bucket id: (murmur3_32(encode(v)) & Int.MaxValue) % n. */
  def ice_bucket(numBuckets: Int, c: Column): Column = col(IceBucket(numBuckets, ex(c)))

  /** Width-W floored truncation (ints/longs/decimals negative-safe; strings by
    * codepoint; binary by byte). */
  def ice_truncate(width: Int, c: Column): Column = col(IceTruncate(width, ex(c)))

  /** Year ordinal since 1970 of a date/timestamp (UTC). */
  def ice_years(c: Column): Column = col(IceYears(ex(c)))

  /** Month ordinal since 1970-01 of a date/timestamp (UTC). */
  def ice_months(c: Column): Column = col(IceMonths(ex(c)))

  /** Day ordinal since 1970-01-01 of a date/timestamp (UTC). */
  def ice_days(c: Column): Column = col(IceDays(ex(c)))

  /** Hour ordinal since 1970-01-01T00 of a timestamp (UTC). */
  def ice_hours(c: Column): Column = col(IceHours(ex(c)))

  /** Register all transforms as SQL functions (ice_bucket(n, x), ...). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"Expected int literal, got: $other")
      }
    registry.createOrReplaceTempFunction(
      "ice_bucket", es => IceBucket(intArg(es.head), es(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "ice_truncate", es => IceTruncate(intArg(es.head), es(1)), "built-in")
    registry.createOrReplaceTempFunction("ice_years", es => IceYears(es.head), "built-in")
    registry.createOrReplaceTempFunction("ice_months", es => IceMonths(es.head), "built-in")
    registry.createOrReplaceTempFunction("ice_days", es => IceDays(es.head), "built-in")
    registry.createOrReplaceTempFunction("ice_hours", es => IceHours(es.head), "built-in")
    // graft_normalize(text[, 'NFC'|'NFD'|'NFKC'|'NFKD']) — SQL surface of
    // the codegen'd Unicode normalizer (pre-dedup corpus hygiene)
    registry.createOrReplaceTempFunction("graft_normalize", es => {
      val form = if (es.size < 2) "NFC" else es(1).eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString.toUpperCase
        case other => throw new IllegalArgumentException(
          s"Expected a literal form string, got: $other")
      }
      graft.expressions.UnicodeNormalize(es.head, form)
    }, "built-in")
    // graft_extract_text(html[, maxLinkDensity]) — raw-web markup → text
    // (tag strip, entity decode, whitespace collapse; optional
    // link-density boilerplate line removal)
    registry.createOrReplaceTempFunction("graft_extract_text", es => {
      val maxLd = if (es.size < 2) 1.0 else es(1).eval(null) match {
        case d: Double => d
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(
          s"Expected a literal link-density threshold, got: $other")
      }
      graft.expressions.ExtractText(es.head, maxLd)
    }, "built-in")
  }
}
