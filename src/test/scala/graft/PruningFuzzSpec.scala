package graft

import java.nio.file.Files

import scala.util.Random

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr.{Expr, Exprs}
import graft.meta.expr.Exprs._
import graft.table.IceTable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the pruning cascade (SURVEY §7.3 watch-list item 2:
  * wrong bounds semantics ⇒ silent wrong pruning — "Q4-style differential
  * tests are mandatory"): random predicates over a bucket+day+truncate
  * partitioned table must return exactly what plain Spark returns on the
  * original data, for every predicate, while pruning stays active.
  */
class PruningFuzzSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val li = Tables.load(spark, sf0001, "lineitem").cache()

  private lazy val table: IceTable = {
    val loc = Files.createTempDirectory("graft-fuzz-").toString + "/t"
    val schema = Schema.fresh(li.schema)
    val spec = PartitionSpec.builderFor(schema)
      .bucket("l_orderkey", 4).month("l_shipdate").truncate("l_returnflag", 1)
      .build()
    val t = IceTable.create(spark, loc, schema, spec)
    // several appends → several manifests → manifest pruning in play
    t.append(li.filter(col("l_orderkey") % 3 === 0))
    t.append(li.filter(col("l_orderkey") % 3 === 1))
    t.append(li.filter(col("l_orderkey") % 3 === 2))
    t
  }

  private val rnd = new Random(987654321L)

  /** Random predicate + its Spark Column equivalent. */
  private def randomPredicate(): (Expr, Column) = {
    def key = rnd.nextInt(6000).toLong
    def qty = rnd.nextInt(50).toDouble + rnd.nextDouble()
    def date = f"199${rnd.nextInt(6)}%s-${rnd.nextInt(12) + 1}%02d-${rnd.nextInt(28) + 1}%02d"
    def flag = Seq("A", "N", "R")(rnd.nextInt(3))
    val leaves: Seq[() => (Expr, Column)] = Seq(
      () => { val v = key; (equalTo("l_orderkey", v), col("l_orderkey") === v) },
      () => { val v = key; (lessThan("l_orderkey", v), col("l_orderkey") < v) },
      () => { val v = key; (greaterThanOrEqual("l_orderkey", v), col("l_orderkey") >= v) },
      () => { val v = qty; (greaterThan("l_quantity", v), col("l_quantity") > v) },
      () => { val v = qty; (lessThanOrEqual("l_quantity", v), col("l_quantity") <= v) },
      () => { val d = date
        (lessThan("l_shipdate", d + " 00:00:00"),
          col("l_shipdate") < lit(d).cast("timestamp_ntz")) },
      () => { val d = date
        (greaterThanOrEqual("l_shipdate", d + " 00:00:00"),
          col("l_shipdate") >= lit(d).cast("timestamp_ntz")) },
      () => { val v = flag; (equalTo("l_returnflag", v), col("l_returnflag") === v) },
      () => { val v = flag; (notEqualTo("l_returnflag", v), col("l_returnflag") =!= v) },
      () => { val vs = Seq(key, key, key)
        (in("l_orderkey", vs: _*), col("l_orderkey").isin(vs: _*)) },
      () => { val v = flag
        (startsWith("l_returnflag", v), col("l_returnflag").startsWith(v)) },
      () => (isNull("l_comment_missing_ok"), lit(false)) // never used; placeholder
    ).dropRight(1)
    def gen(depth: Int): (Expr, Column) = {
      if (depth == 0 || rnd.nextDouble() < 0.5) leaves(rnd.nextInt(leaves.size))()
      else rnd.nextInt(3) match {
        case 0 => val (a, ca) = gen(depth - 1); val (b, cb) = gen(depth - 1)
          (and(a, b), ca && cb)
        case 1 => val (a, ca) = gen(depth - 1); val (b, cb) = gen(depth - 1)
          (or(a, b), ca || cb)
        case _ => val (a, ca) = gen(depth - 1); (Exprs.not(a), !ca)
      }
    }
    gen(2)
  }

  test("40 random predicates: pruned scan equals plain Spark filter") {
    var prunedAtLeastOnce = false
    val total = table.newScan().planFiles().size
    (1 to 40).foreach { i =>
      val (expr, column) = randomPredicate()
      val scan = table.newScan().filter(expr)
      val planned = scan.planFiles().size
      if (planned < total) prunedAtLeastOnce = true
      val got = scan.toDF.count()
      val exp = li.filter(column).count()
      assert(got === exp, s"iteration $i: $expr planned=$planned/$total")
    }
    assert(prunedAtLeastOnce, "fuzz never exercised pruning")
  }

  /** Avro files carry no column bounds — the metrics evaluator must treat
    * absent stats as "might match" and fall back to partition pruning +
    * residual row filters, never dropping matching rows. */
  private lazy val avroTable: IceTable = {
    val loc = Files.createTempDirectory("graft-fuzz-avro-").toString + "/t"
    val schema = Schema.fresh(li.schema)
    val spec = PartitionSpec.builderFor(schema)
      .bucket("l_orderkey", 4).month("l_shipdate").build()
    val t = IceTable.create(spark, loc, schema, spec, properties =
      Map(graft.meta.model.TableProperties.DefaultFileFormat -> "avro"))
    t.append(li.filter(col("l_orderkey") % 2 === 0))
    t.append(li.filter(col("l_orderkey") % 2 === 1))
    t
  }

  test("20 random predicates on a stats-less (avro) table: no over-pruning") {
    var prunedAtLeastOnce = false
    val total = avroTable.newScan().planFiles().size
    (1 to 20).foreach { i =>
      val (expr, column) = randomPredicate()
      val scan = avroTable.newScan().filter(expr)
      val planned = scan.planFiles().size
      if (planned < total) prunedAtLeastOnce = true
      val got = scan.toDF.count()
      val exp = li.filter(column).count()
      assert(got === exp, s"iteration $i: $expr planned=$planned/$total")
    }
    // partition-value pruning still works without file metrics
    assert(prunedAtLeastOnce, "avro fuzz never exercised partition pruning")
  }

  /** metrics mode `none` strips counts AND bounds from manifest entries —
    * like avro's absent stats, pruning must degrade to partition values
    * only, never dropping matching rows; `counts` keeps null counts but no
    * bounds, exercising the counts-without-bounds evaluator branches. */
  private lazy val noStatsTable: IceTable = {
    val loc = Files.createTempDirectory("graft-fuzz-nostats-").toString + "/t"
    val schema = Schema.fresh(li.schema)
    val spec = PartitionSpec.builderFor(schema)
      .bucket("l_orderkey", 4).month("l_shipdate").build()
    val t = IceTable.create(spark, loc, schema, spec, properties = Map(
      graft.table.MetricsModes.DefaultProp -> "none",
      graft.table.MetricsModes.ColumnPropPrefix + "l_quantity" -> "counts"))
    t.append(li.filter(col("l_orderkey") % 2 === 0))
    t.append(li.filter(col("l_orderkey") % 2 === 1))
    t
  }

  test("20 random predicates under metrics mode none/counts: no over-pruning") {
    val files = noStatsTable.newScan().planFiles().map(_.file)
    assert(files.forall(_.lowerBounds.isEmpty), "mode none must strip bounds")
    assert(files.forall(f => f.nullCounts.keySet subsetOf
      Set(noStatsTable.schema.fieldId("l_quantity"))))
    var prunedAtLeastOnce = false
    val total = files.size
    (1 to 20).foreach { i =>
      val (expr, column) = randomPredicate()
      val scan = noStatsTable.newScan().filter(expr)
      val planned = scan.planFiles().size
      if (planned < total) prunedAtLeastOnce = true
      val got = scan.toDF.count()
      val exp = li.filter(column).count()
      assert(got === exp, s"iteration $i: $expr planned=$planned/$total")
    }
    assert(prunedAtLeastOnce, "no-stats fuzz never exercised partition pruning")
  }
}
