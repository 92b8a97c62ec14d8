package graft

import java.nio.file.Files

import scala.util.Random

import graft.meta.Schema
import graft.table.IceTable

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded random write→read equality across the type surface (ref
  * `spark/src/test/.../data/RandomData.java:59` analogue), incl. nested
  * struct/list/map, decimal, NaN/±0.0 floats, and null ratios.
  */
class RoundTripSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("b", BooleanType),
    StructField("i", IntegerType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dec", DecimalType(18, 4)),
    StructField("date", DateType),
    StructField("ts", TimestampType),
    StructField("arr", ArrayType(LongType)),
    StructField("map", MapType(StringType, DoubleType)),
    StructField("nested", StructType(Seq(
      StructField("x", IntegerType),
      StructField("y", StringType))))))

  private def randomRows(seed: Long, n: Int): Seq[Row] = {
    val rnd = new Random(seed)
    def opt[T](v: => T): Any = if (rnd.nextDouble() < 0.1) null else v
    (0 until n).map { i =>
      Row(
        i.toLong,
        opt(rnd.nextBoolean()),
        opt(rnd.nextInt()),
        opt(rnd.nextInt(10) match {
          case 0 => Float.NaN
          case 1 => -0.0f
          case _ => rnd.nextFloat() * 1000
        }),
        opt(if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextDouble() * 1e6),
        opt(rnd.alphanumeric.take(rnd.nextInt(30)).mkString + "☃"),
        opt(Array.fill(rnd.nextInt(16))(rnd.nextInt().toByte)),
        opt(new java.math.BigDecimal(BigInt(rnd.nextLong() % 100000000L).bigInteger)
          .movePointLeft(4)),
        opt(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(20000).toLong))),
        opt(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(1000000) * 1000L))),
        opt(Seq.fill(rnd.nextInt(5))(rnd.nextLong())),
        opt(Map(rnd.alphanumeric.take(3).mkString -> rnd.nextDouble())),
        opt(Row(rnd.nextInt(), rnd.alphanumeric.take(5).mkString)))
    }
  }

  private def normVal(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
    case r: Row => r.toSeq.map(normVal).mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(normVal).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, vv) => s"${normVal(k)}->${normVal(vv)}" }.toSeq.sorted.mkString("(", ",", ")")
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case other => String.valueOf(other)
  }

  private def canon(rows: Seq[Row]): Seq[String] =
    rows.map(r => r.toSeq.map(normVal).mkString("|")).sorted

  test("random data round-trips through append + scan (seed 314358)") {
    val rows = randomRows(314358L, 500)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 3), schema)
    val loc = Files.createTempDirectory("graft-rt-").toString + "/t"
    val t = IceTable.create(spark, loc, Schema.fresh(schema))
    t.append(df)
    val back = t.toDF.collect()
    assert(back.length === rows.size)
    assert(canon(back.toSeq) === canon(df.collect().toSeq))
  }

  test("random data survives a CoW rewrite cycle intact") {
    val rows = randomRows(271828L, 300)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 2), schema)
    val loc = Files.createTempDirectory("graft-rt2-").toString + "/t"
    val t = IceTable.create(spark, loc, Schema.fresh(schema))
    t.append(df)
    // delete nothing-shaped condition that still forces rewrites of all files
    t.delete(graft.meta.expr.Exprs.equalTo("id", -1L))
    t.rewriteDataFiles(minInputFiles = 1)
    assert(canon(t.toDF.collect().toSeq) === canon(df.collect().toSeq))
  }
}
