package graft.table

import java.nio.file.Files

import graft.SparkSessionHelper
import graft.meta.Schema

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table-level column statistics (ANALYZE): one-pass computation, snapshot
  * pinning, metadata round-trip, CBO visibility through the DSv2 scan, and
  * lifecycle (staleness on write, deletion on expire). */
class StatsSpec extends AnyFunSuite {
  import SparkSessionHelper._
  import spark.implicits._

  private def tmpLoc(): String =
    Files.createTempDirectory("graft-stats-").toString + "/t"

  private def sample() =
    (1 to 1000).map(i => (i.toLong, s"cat${i % 7}",
      if (i % 10 == 0) null else s"name$i")).toDF("id", "cat", "name")
      .repartition(2)

  test("computeStats profiles NDV, nulls, and string lengths in one pass") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(sample().schema))
    t.append(sample())
    val ref = t.computeStats()
    assert(ref.snapshotId === t.currentSnapshot.get.snapshotId)
    val (rowCount, stats) = TableStats.read(t.io, ref.path)
    assert(rowCount === 1000L)
    val byName = stats.map(s => t.meta.schema.fieldName(s.fieldId) -> s).toMap
    // HLL++ default rsd is 5%; these cardinalities are tiny so expect near-exact
    assert(math.abs(byName("id").distinctCount - 1000L) <= 50)
    assert(byName("cat").distinctCount === 7L)
    assert(byName("id").nullCount === 0L)
    assert(byName("name").nullCount === 100L)
    assert(byName("cat").maxLen === Some(4L))
    assert(byName("cat").avgLen === Some(4L))
    assert(byName("id").avgLen === None)
  }

  test("stats survive a metadata round-trip and serve only their snapshot") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(sample().schema))
    t.append(sample())
    val analyzed = t.currentSnapshot.get.snapshotId
    t.computeStats(Seq("id", "cat"))
    val reloaded = IceTable.load(spark, loc)
    assert(reloaded.meta.statsFiles.map(_.snapshotId) === Seq(analyzed))
    assert(TableStats.forSnapshot(reloaded, analyzed).get.size === 2)
    // a write makes the profile stale for the NEW snapshot…
    reloaded.append(sample())
    val head = reloaded.currentSnapshot.get.snapshotId
    assert(TableStats.forSnapshot(reloaded, head).isEmpty)
    // …but the analyzed snapshot keeps serving time travel
    assert(TableStats.forSnapshot(reloaded, analyzed).isDefined)
  }

  test("recompute replaces the same-snapshot entry instead of stacking") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(sample().schema))
    t.append(sample())
    t.computeStats(Seq("id"))
    t.computeStats(Seq("id", "cat"))
    assert(t.meta.statsFiles.size === 1)
    assert(TableStats.forSnapshot(t, t.currentSnapshot.get.snapshotId).get.size === 2)
  }

  test("ineligible (array) columns are skipped") {
    val df = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f))).toDF("id", "emb")
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(df.schema))
    t.append(df)
    val ref = t.computeStats()
    val stats = TableStats.read(t.io, ref.path)._2
    assert(stats.map(s => t.meta.schema.fieldName(s.fieldId)) === Seq("id"))
  }

  private lazy val warehouse = {
    val dir = Files.createTempDirectory("graft-stats-wh-").toString
    spark.conf.set("spark.sql.catalog.stc", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.stc.warehouse", dir)
    dir
  }

  test("CALL compute_table_stats feeds per-attribute stats into the CBO") {
    warehouse
    spark.sql("CREATE TABLE stc.db.analyzed (id BIGINT, cat STRING)")
    spark.range(500).select($"id", concat(lit("c"), $"id" % 5).as("cat"))
      .writeTo("stc.db.analyzed").append()
    val out = spark.sql(
      "CALL stc.system.compute_table_stats(table => 'db.analyzed')").collect()
    assert(out.head.getLong(1) === 2L)
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val attrStats = spark.table("stc.db.analyzed")
        .queryExecution.optimizedPlan.stats.attributeStats
      assert(attrStats.nonEmpty, "expected V2 column stats in catalyst stats")
      val cat = attrStats.find(_._1.name == "cat").map(_._2).get
      assert(cat.distinctCount.map(_.toLong) === Some(5L))
      assert(cat.nullCount.map(_.toLong) === Some(0L))
      // exact bounds flow for numeric columns (range selectivity)
      val id = attrStats.find(_._1.name == "id").map(_._2).get
      assert(id.min === Some(0L) && id.max === Some(499L))
      // a write invalidates: the head snapshot has no pinned stats file
      spark.range(10).select($"id", lit("x").as("cat"))
        .writeTo("stc.db.analyzed").append()
      val stale = spark.table("stc.db.analyzed")
        .queryExecution.optimizedPlan.stats.attributeStats
      assert(stale.isEmpty, "stale stats must not be reported for a new snapshot")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("statistics metadata table flattens the persisted profile") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(sample().schema))
    t.append(sample())
    t.computeStats(Seq("cat", "name"))
    val rows = t.metadataTable("statistics")
      .select("column_name", "null_count", "row_count")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(("cat", 0L, 1000L), ("name", 100L, 1000L)))
  }

  test("expiring the analyzed snapshot drops its stats entry and file") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(sample().schema))
    t.append(sample())
    t.computeStats(Seq("id"))
    val statsPath = t.meta.statsFiles.head.path
    t.append(sample()) // stats snapshot becomes an ancestor
    Thread.sleep(5)
    val (expired, _, _) = t.expireSnapshots(System.currentTimeMillis(), retainLast = 1)
    assert(expired >= 1)
    assert(t.meta.statsFiles.isEmpty)
    assert(!t.io.exists(statsPath))
  }
}
