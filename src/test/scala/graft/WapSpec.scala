package graft

import java.nio.file.Files

import graft.meta.Schema
import graft.table.{IceTable, Listeners}

import org.scalatest.funsuite.AnyFunSuite

class WapSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val orders = Tables.load(spark, sf0001, "orders").cache()

  test("write-audit-publish: staged append is invisible until cherry-picked") {
    val loc = Files.createTempDirectory("graft-wap-").toString + "/t"
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(100))
    val staged = t.stageAppend(orders.limit(150).exceptAll(orders.limit(100)), "wap-1")
    // not visible on the main branch
    assert(t.toDF.count() === 100)
    // auditable by snapshot id
    assert(t.newScan().useSnapshot(staged).toDF.count() === 150)
    assert(t.meta.snapshot(staged).get.summary("wap.id") === "wap-1")
    // publish
    t.cherrypick(staged)
    assert(t.toDF.count() === 150)
  }

  test("SQL WAP: spark.wap.id stages inserts; cherrypick publishes") {
    val wh = Files.createTempDirectory("graft-wap-wh-").toString
    spark.conf.set("spark.sql.catalog.wap", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wap.warehouse", wh)
    spark.sql("CREATE TABLE wap.db.t (k INT) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true')")
    spark.sql("INSERT INTO wap.db.t VALUES (1)")
    try {
      spark.conf.set("spark.wap.id", "audit-7")
      spark.sql("INSERT INTO wap.db.t VALUES (2), (3)")
      // staged, not current: readers see the pre-WAP table
      assert(spark.sql("SELECT count(*) c FROM wap.db.t").head().getLong(0) === 1L)
      val t = IceTable.load(spark, s"$wh/db/t")
      val staged = t.meta.snapshots
        .find(_.summary.get("wap.id").contains("audit-7")).get.snapshotId
      assert(t.newScan().useSnapshot(staged).toDF.count() === 3)
      spark.sql(s"CALL wap.system.cherrypick_snapshot(table => 'db.t', " +
        s"snapshot_id => $staged)")
      assert(spark.sql("SELECT count(*) c FROM wap.db.t").head().getLong(0) === 3L)
    } finally spark.conf.unset("spark.wap.id")
    // without the table opt-in, spark.wap.id is ignored
    spark.sql("CREATE TABLE wap.db.plain (k INT)")
    try {
      spark.conf.set("spark.wap.id", "audit-8")
      spark.sql("INSERT INTO wap.db.plain VALUES (1)")
      assert(spark.sql("SELECT count(*) c FROM wap.db.plain").head().getLong(0) === 1L)
    } finally spark.conf.unset("spark.wap.id")
  }

  test("WAP refuses overwrites and keeps per-write options on staged appends") {
    val wh = Files.createTempDirectory("graft-wap-ow-").toString
    spark.conf.set("spark.sql.catalog.wap2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wap2.warehouse", wh)
    spark.sql("CREATE TABLE wap2.db.t (k INT) " +
      "TBLPROPERTIES ('write.wap.enabled' = 'true')")
    spark.sql("INSERT INTO wap2.db.t VALUES (1)")
    try {
      spark.conf.set("spark.wap.id", "audit-9")
      // overwrites cannot be silently published mid-audit
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE wap2.db.t VALUES (9)")
      }
      assert(e.getMessage != null)
      assert(spark.sql("SELECT k FROM wap2.db.t").head().getInt(0) === 1)
      // snapshot-property options ride on the STAGED snapshot
      import spark.implicits._
      Seq(2).toDF("k").writeTo("wap2.db.t")
        .option("snapshot-property.run", "r-9").append()
      val t = IceTable.load(spark, s"$wh/db/t")
      val staged = t.meta.snapshots
        .find(_.summary.get("wap.id").contains("audit-9")).get
      assert(staged.summary.get("run") === Some("r-9"))
    } finally spark.conf.unset("spark.wap.id")
  }

  test("listeners receive scan and commit events") {
    Listeners.clear()
    val scans = scala.collection.mutable.ArrayBuffer[Listeners.ScanEvent]()
    val commits = scala.collection.mutable.ArrayBuffer[Listeners.CreateSnapshotEvent]()
    Listeners.register(classOf[Listeners.ScanEvent])(scans += _)
    Listeners.register(classOf[Listeners.CreateSnapshotEvent])(commits += _)
    try {
      val loc = Files.createTempDirectory("graft-ev-").toString + "/t"
      val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
      t.append(orders.limit(10))
      assert(commits.exists(_.operation == "append"))
      t.toDF.count()
      assert(scans.nonEmpty)
      assert(scans.last.plannedFiles > 0)
    } finally Listeners.clear()
  }

  test("scan summary: top partitions by records added in a time range") {
    val loc = Files.createTempDirectory("graft-ss-").toString + "/t"
    val schema = Schema.fresh(orders.schema)
    val spec = graft.meta.PartitionSpec.builderFor(schema).identity("o_orderstatus").build()
    val t = IceTable.create(spark, loc, schema, spec)
    val t0 = System.currentTimeMillis() - 1000
    t.append(orders)
    val rows = graft.table.ScanSummary.partitions(t, t0, System.currentTimeMillis() + 1000, 2)
      .collect()
    assert(rows.length === 2)
    val exp = orders.groupBy("o_orderstatus").count()
      .orderBy(org.apache.spark.sql.functions.desc("count")).collect()
    assert(rows(0).getString(0) === s"o_orderstatus=${exp(0).getString(0)}")
    assert(rows(0).getLong(1) === exp(0).getLong(1))
  }
}
