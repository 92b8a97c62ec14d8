package graft

import graft.meta.transforms.{Murmur3, TransformEval}

import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Spec-example hash values from the Iceberg format spec (mirrored by ref
  * `api/src/test/java/org/apache/iceberg/transforms/TestBucketing.java:64`).
  */
class TransformSpec extends AnyFunSuite {
  test("murmur3 spec vectors: long encodings") {
    assert(Murmur3.hashLong(1L) === 1392991556)
    assert(Murmur3.hashLong(34L) === 2017239379)
    // date 2017-11-16 = epoch day 17486
    assert(Murmur3.hashLong(17486L) === -653330422)
    // time 22:31:08 = 81068000000 micros
    assert(Murmur3.hashLong(81068000000L) === -662762989)
    // timestamp 2017-11-16T22:31:08 UTC micros
    assert(Murmur3.hashLong(1510871468000000L) === -2047944441)
    // float/double 1.0 hashed via doubleToLongBits
    assert(Murmur3.hashLong(java.lang.Double.doubleToLongBits(1.0)) === -142385009)
  }

  test("murmur3 spec vectors: byte encodings") {
    assert(Murmur3.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    assert(Murmur3.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
    // decimal 14.20 → unscaled 1420 → minimal BE two's-complement bytes
    assert(Murmur3.hashBytes(new java.math.BigDecimal("14.20").unscaledValue.toByteArray)
      === -500754589)
  }

  test("hashLong equals hashBytes of little-endian longs") {
    val rnd = new scala.util.Random(314358)
    (1 to 200).foreach { _ =>
      val v = rnd.nextLong()
      val buf = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v)
      assert(Murmur3.hashLong(v) === Murmur3.hashBytes(buf.array))
    }
  }

  test("bucket ids") {
    assert(TransformEval.bucketInt(100, 34) === TransformEval.bucketLong(100, 34L))
    assert(TransformEval.bucketUtf8(100, UTF8String.fromString("iceberg"))
      === (1210000089 & Int.MaxValue) % 100)
    assert(TransformEval.bucketDecimal(100, Decimal(new java.math.BigDecimal("14.20")))
      === (-500754589 & Int.MaxValue) % 100)
  }

  test("truncate: floored and negative-safe") {
    assert(TransformEval.truncateInt(10, 1) === 0)
    assert(TransformEval.truncateInt(10, -1) === -10)
    assert(TransformEval.truncateLong(10, 99L) === 90L)
    assert(TransformEval.truncateLong(10, -99L) === -100L)
    assert(TransformEval.truncateUtf8(5, UTF8String.fromString("abcdefg")).toString === "abcde")
    assert(TransformEval.truncateUtf8(5, UTF8String.fromString("abc")).toString === "abc")
    assert(TransformEval.truncateBytes(2, Array[Byte](1, 2, 3)).toSeq === Seq[Byte](1, 2))
    val d = TransformEval.truncateDecimal(50, Decimal(new java.math.BigDecimal("10.65")))
    assert(d.toJavaBigDecimal === new java.math.BigDecimal("10.50"))
    val dn = TransformEval.truncateDecimal(50, Decimal(new java.math.BigDecimal("-0.05")))
    assert(dn.toJavaBigDecimal === new java.math.BigDecimal("-0.50"))
  }

  test("temporal ordinals") {
    // 2017-11-16 = epoch day 17486
    assert(TransformEval.yearsFromDays(17486) === 47)
    assert(TransformEval.monthsFromDays(17486) === 47 * 12 + 10)
    assert(TransformEval.daysFromMicros(1510871468000000L) === 17486)
    assert(TransformEval.hoursFromMicros(1510871468000000L) === 17486 * 24 + 22)
    // pre-epoch micros floor, not truncate-toward-zero
    assert(TransformEval.daysFromMicros(-1L) === -1)
  }
}
