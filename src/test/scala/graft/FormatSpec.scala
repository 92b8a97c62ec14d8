package graft

import java.nio.file.Files

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr.Exprs._
import graft.meta.model.TableProperties
import graft.table.{HadoopCatalog, IceTable}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val orders = Tables.load(spark, sf0001, "orders").cache()

  test("ORC table: write, metrics-pruned scan, delete") {
    val loc = Files.createTempDirectory("graft-orc-").toString + "/t"
    val schema = Schema.fresh(orders.schema)
    val t = IceTable.create(spark, loc, schema,
      properties = Map(TableProperties.DefaultFileFormat -> "orc"))
    t.append(orders)
    assert(t.newScan().planFiles().forall(_.file.format == "orc"))
    assert(t.toDF.count() === orders.count())
    // ORC footer metrics enable pruning
    assert(t.newScan().filter(equalTo("o_orderkey", -5L)).planFiles().isEmpty)
    val exp = orders.filter(col("o_totalprice") > 100000.0).count()
    assert(t.newScan().filter(greaterThan("o_totalprice", 100000.0)).toDF.count() === exp)
    // CoW delete on orc
    t.delete(greaterThan("o_totalprice", 100000.0))
    assert(t.toDF.count() === orders.count() - exp)
  }

  test("catalog: create/CTAS/load/list/drop") {
    val wh = Files.createTempDirectory("graft-cat-").toString
    val cat = new HadoopCatalog(spark, wh)
    val t = cat.createTableAs("db.orders", orders, _.identity("o_orderstatus"))
    assert(cat.tableExists("db.orders"))
    assert(cat.listTables("db") === Seq("orders"))
    assert(cat.loadTable("db.orders").toDF.count() === orders.count())
    // RTAS
    cat.replaceTableAs("db.orders", orders.limit(10))
    assert(cat.loadTable("db.orders").toDF.count() === 10)
    assert(cat.dropTable("db.orders"))
    assert(!cat.tableExists("db.orders"))
  }

  test("large commits collect footer metrics via a distributed job") {
    val loc = Files.createTempDirectory("graft-dist-").toString + "/t"
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.repartition(70)) // > DistributedMetricsThreshold files
    val tasks = t.newScan().planFiles()
    assert(tasks.size === 70)
    // metrics present on every file (bounds enable pruning)
    assert(tasks.forall(_.file.recordCount > 0))
    assert(tasks.forall(_.file.lowerBounds.nonEmpty))
    assert(t.newScan().filter(equalTo("o_orderkey", -1L)).planFiles().isEmpty)
    assert(t.toDF.count() === orders.count())
  }
}
