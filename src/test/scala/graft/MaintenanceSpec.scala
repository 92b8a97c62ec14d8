package graft

import java.nio.file.Files

import graft.meta.{PartitionSpec, Schema}
import graft.streaming.Streaming
import graft.table.IceTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private def tmpLoc(): String =
    Files.createTempDirectory("graft-maint-").toString + "/t"

  private lazy val orders = Tables.load(spark, sf0001, "orders").cache()

  test("orphan removal in a shared object-store bucket stays table-scoped") {
    val base = Files.createTempDirectory("graft-orph-bucket-").toString
    val bucket = s"$base/bucket"
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val props = Map(
      "write.object-storage.enabled" -> "true",
      "write.object-storage.path" -> bucket)
    val a = IceTable.create(spark, s"$base/db/a", Schema.fresh(df.schema),
      properties = props)
    val b = IceTable.create(spark, s"$base/db/b", Schema.fresh(df.schema),
      properties = props)
    a.append(df); b.append(df)
    // hand-planted orphans under each table's hashed context
    a.io.writeString(s"$bucket/deadbeef/db/a/orphan.parquet", "x")
    a.io.writeString(s"$bucket/deadbeef/db/b/orphan.parquet", "x")
    val removed = graft.table.Maintenance.removeOrphanFiles(
      a, System.currentTimeMillis() + 60000)
    assert(removed.exists(_.endsWith("db/a/orphan.parquet")), removed)
    // table b's files — live AND orphaned — are not table a's to touch
    assert(removed.forall(!_.contains("/db/b/")), removed)
    assert(a.io.exists(s"$bucket/deadbeef/db/b/orphan.parquet"))
    assert(a.toDF.count() === 2)
    assert(b.toDF.count() === 2)
  }

  test("orphan removal never eats the metadata tree when the bucket contains the table") {
    val base = Files.createTempDirectory("graft-orph-anc-").toString
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    // storage root is an ANCESTOR of the table location: the recursive
    // listing reaches the table's own metadata dir
    val t = IceTable.create(spark, s"$base/db/t", Schema.fresh(df.schema),
      properties = Map(
        "write.object-storage.enabled" -> "true",
        "write.object-storage.path" -> base))
    t.append(df)
    t.append(df)
    val removed = graft.table.Maintenance.removeOrphanFiles(
      t, System.currentTimeMillis() + 60000)
    assert(removed.forall(!_.contains("/metadata/")), removed)
    // the table survives with full history
    val fresh = IceTable.load(spark, s"$base/db/t")
    assert(fresh.toDF.count() === 4)
    assert(fresh.snapshots.size === 2)
  }

  test("removal commit opens only manifests that can contain the removed files") {
    import graft.meta.model.Operation
    import graft.table.ManifestIO
    val loc = tmpLoc()
    import spark.implicits._
    val df1 = Seq((1, "a")).toDF("k", "v")
    val schema = Schema.fresh(df1.schema)
    val t = IceTable.create(spark, loc, schema,
      PartitionSpec.builderFor(schema).identity("k").build())
    // three appends, one partition each → three manifests with disjoint
    // partition summaries
    (1 to 3).foreach(k => t.append(Seq((k, s"v$k")).toDF("k", "v")))
    val file2 = t.newScan().planFiles()
      .find(_.file.partition.head == 2).get.file
    val before = ManifestIO.readCounter.get()
    t.commitSnapshot(Operation.Delete, Nil, Set(file2.path),
      removedMeta = Seq(file2))
    val opened = ManifestIO.readCounter.get() - before
    assert(opened === 1L,
      s"summary pruning should open exactly the k=2 manifest, opened $opened")
    assert(t.toDF.select("k").collect().map(_.getInt(0)).sorted === Array(1, 3))
    // without metadata, every manifest is a candidate (k=1 and k=3 remain)
    val file1 = t.newScan().planFiles()
      .find(_.file.partition.head == 1).get.file
    val before2 = ManifestIO.readCounter.get()
    t.commitSnapshot(Operation.Delete, Nil, Set(file1.path))
    assert(ManifestIO.readCounter.get() - before2 === 2L)
    assert(t.toDF.select("k").collect().map(_.getInt(0)) === Array(3))
  }

  test("partial-progress compaction lands as multiple independent commits") {
    import spark.implicits._
    val df1 = Seq((1, "a")).toDF("k", "v")
    val schema = Schema.fresh(df1.schema)
    val t = IceTable.create(spark, tmpLoc(), schema,
      PartitionSpec.builderFor(schema).identity("k").build())
    (1 to 2).foreach { _ =>
      t.append((1 to 4).map(k => (k, s"v$k")).toDF("k", "v").repartition(1))
    }
    val snapsBefore = t.meta.snapshots.size
    val (rw, add) = t.rewriteDataFiles(partialProgressCommits = 2)
    assert(rw === 8 && add === 4)
    val replaces = t.meta.snapshots.drop(snapsBefore)
    assert(replaces.size === 2, s"expected 2 partial commits, got ${replaces.size}")
    assert(replaces.forall(_.operation == graft.meta.model.Operation.Replace))
    assert(t.toDF.count() === 8)
  }

  test("files metadata table reads many-manifest tables on executors") {
    import spark.implicits._
    val df1 = Seq((1L, "a")).toDF("id", "v")
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(df1.schema),
      properties = Map("commit.manifest-merge.enabled" -> "false"))
    (1L to 20L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v").repartition(1)))
    // 20 manifests > the distributed threshold → executor-side entry rows
    val files = t.metadataTable("files")
    assert(files.count() === 20L)
    assert(files.select("record_count").agg(org.apache.spark.sql.functions.sum("record_count"))
      .collect()(0).getLong(0) === 20L)
    assert(files.select("file_path").distinct().count() === 20L)
  }

  test("scoped compaction (where) rewrites only files that may match") {
    val wh = Files.createTempDirectory("graft-maint-wh-").toString
    spark.conf.set("spark.sql.catalog.gmw", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmw.warehouse", wh)
    spark.sql("CREATE TABLE gmw.db.sc (k INT, v STRING) PARTITIONED BY (k)")
    (1 to 2).foreach { _ =>
      spark.sql("INSERT INTO gmw.db.sc VALUES (1, 'x'), (2, 'y')")
    }
    val t = IceTable.load(spark, s"$wh/db/sc")
    val before = t.newScan().planFiles().map(_.file.path).toSet
    assert(before.size === 4)
    val (rw, add) = t.rewriteDataFiles(
      filter = graft.meta.expr.Exprs.equalTo("k", 1))
    assert(rw === 2 && add === 1, s"expected only k=1 files rewritten: ($rw, $add)")
    // the k=2 files are untouched
    val after = t.newScan().planFiles().map(_.file.path).toSet
    assert(before.filter(_.contains("=2")).subsetOf(after))
    assert(t.toDF.collect().length === 4)
    // SQL surface compacts the remaining partition, leaving the k=1 file
    val row = spark.sql("CALL gmw.system.rewrite_data_files(table => 'db.sc', " +
      "where => 'k = 2')").collect().head
    assert((row.getLong(0), row.getLong(1)) === ((2L, 1L)))
    assert(spark.sql("SELECT count(*) c FROM gmw.db.sc").head().getLong(0) === 4L)
  }

  test("compaction bin-packs small files and preserves data") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    (1 to 5).foreach(i => t.append(orders.limit(100 * i).repartition(3)))
    val before = t.newScan().planFiles().size
    assert(before >= 15)
    val total = t.toDF.count()
    val (rewritten, added) = t.rewriteDataFiles(targetSizeBytes = 512L * 1024 * 1024)
    assert(rewritten === before)
    assert(added < before)
    assert(t.toDF.count() === total)
    assert(t.currentSnapshot.get.operation === "replace")
  }

  test("bin-pack selects oversized files for split, leaves right-sized alone") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.repartition(1)) // one "big" file
    val big = t.newScan().planFiles().head.file
    val total = t.toDF.count()
    // target sized so the file lands inside [0.75t, 1.8t]: no-op
    assert(t.rewriteDataFiles(targetSizeBytes = big.fileSizeBytes) === ((0, 0)))
    // target sized so the file exceeds 1.8t: selected for rewrite/split
    val (rw, added) = t.rewriteDataFiles(targetSizeBytes = big.fileSizeBytes / 3)
    assert(rw === 1 && added >= 1)
    assert(t.toDF.count() === total)
    // a lone small file does not trip minInputFiles
    val loc2 = tmpLoc()
    val t2 = IceTable.create(spark, loc2, Schema.fresh(orders.schema))
    t2.append(orders.limit(10))
    assert(t2.rewriteDataFiles() === ((0, 0)))
  }

  test("sort rewrite re-clusters files so the sort key becomes prunable") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    // 4 appends of interleaved key ranges: every file spans ~the full keyspace
    (0 until 4).foreach(i =>
      t.append(orders.filter(col("o_orderkey") % 4 === i).repartition(2)))
    val total = t.toDF.count()
    val before = t.newScan().planFiles()
    assert(before.size >= 8)
    val keyRange = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
    val mid = (keyRange.getLong(0) + keyRange.getLong(1)) / 2
    // before: an upper-half filter prunes nothing (all files span the range)
    val prunedBefore = t.newScan()
      .filter(graft.meta.expr.Exprs.greaterThan("o_orderkey", mid)).planFiles().size
    assert(prunedBefore === before.size)

    val (rw, added) = t.rewriteDataFilesSorted(
      targetSizeBytes = 16L * 1024, sortOrderSpec = Some("o_orderkey ASC"))
    assert(rw === before.size)
    assert(added >= 2) // target sized to force multiple sorted outputs
    assert(t.toDF.count() === total)
    assert(t.currentSnapshot.get.summary("compaction") === "sort")
    // after: the same filter prunes at least one low-range file
    val after = t.newScan().planFiles().size
    val prunedAfter = t.newScan()
      .filter(graft.meta.expr.Exprs.greaterThan("o_orderkey", mid)).planFiles().size
    assert(prunedAfter < after)
    // files are disjointly clustered: sorted read-back equals global sort
    val sortedKeys = t.toDF.select("o_orderkey").collect().map(_.getLong(0))
    assert(sortedKeys.toSet === orders.select("o_orderkey").collect().map(_.getLong(0)).toSet)
  }

  test("z-order rewrite makes BOTH dimensions prunable; rows unchanged") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    // interleaved appends: every file spans the full range of both columns
    (0 until 4).foreach(i =>
      t.append(orders.filter(col("o_orderkey") % 4 === i).repartition(2)))
    val total = t.toDF.count()
    val before = t.newScan().planFiles().size
    val kr = orders.agg(min("o_orderkey"), max("o_orderkey"),
      min("o_custkey"), max("o_custkey")).head()
    val kMid = (kr.getLong(0) + kr.getLong(1)) / 2
    val cMid = (kr.getLong(2) + kr.getLong(3)) / 2
    def pruned(kHi: Boolean, cHi: Boolean): Int = {
      import graft.meta.expr.Exprs._
      t.newScan().filter(and(
        if (kHi) greaterThan("o_orderkey", kMid) else lessThan("o_orderkey", kMid),
        if (cHi) greaterThan("o_custkey", cMid) else lessThan("o_custkey", cMid)))
        .planFiles().size
    }
    assert(pruned(kHi = true, cHi = true) === before) // nothing prunable yet

    val (rw, added) = t.rewriteDataFilesZOrder(
      Seq("o_orderkey", "o_custkey"), targetSizeBytes = 16L * 1024)
    assert(rw === before)
    assert(added >= 4)
    assert(t.toDF.count() === total)
    assert(t.currentSnapshot.get.summary("compaction") === "zorder")
    val after = t.newScan().planFiles().size
    // every quadrant predicate prunes files — that is the z-order property
    // a lexicographic sort cannot give (its trailing column never prunes)
    Seq((true, true), (true, false), (false, true), (false, false)).foreach {
      case (k, c) => assert(pruned(k, c) < after,
        s"quadrant (kHi=$k,cHi=$c) did not prune: ${pruned(k, c)} of $after")
    }
    // content identical to the pre-rewrite table
    assert(t.toDF.exceptAll(orders).count() === 0)
    assert(orders.exceptAll(t.toDF).count() === 0)
    // unsupported column type fails loudly
    intercept[IllegalArgumentException](
      t.rewriteDataFilesZOrder(Seq("o_orderkey", "o_orderstatus")))
  }

  test("z-order rewrite via CALL procedure") {
    val loc = tmpLoc()
    spark.conf.set("spark.sql.catalog.gzo", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gzo.warehouse",
      Files.createTempDirectory("graft-zowh-").toString)
    spark.sql("CREATE TABLE gzo.db.t (a BIGINT, b BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gzo.db.t SELECT CAST(id * 37 % 1000 AS BIGINT), " +
      "CAST(id * 53 % 1000 AS BIGINT), CAST(id AS DOUBLE) FROM range(2000)")
    spark.sql("INSERT INTO gzo.db.t SELECT CAST(id * 11 % 1000 AS BIGINT), " +
      "CAST(id * 7 % 1000 AS BIGINT), CAST(id AS DOUBLE) FROM range(2000)")
    val res = spark.sql(
      "CALL gzo.system.rewrite_data_files(table => 'db.t', strategy => 'zorder', " +
        "sort_order => 'a,b', target_file_size_bytes => 16384)").head()
    assert(res.getLong(0) >= 2)
    assert(spark.sql("SELECT count(*) FROM gzo.db.t").head().getLong(0) === 4000)
  }

  test("sort rewrite via CALL uses the declared table sort order") {
    val loc = tmpLoc()
    spark.conf.set("spark.sql.catalog.gsort", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsort.warehouse",
      Files.createTempDirectory("graft-sortwh-").toString)
    spark.sql("CREATE TABLE gsort.db.t (id BIGINT, v DOUBLE)")
    spark.sql("ALTER TABLE gsort.db.t WRITE ORDERED BY id")
    import spark.implicits._
    spark.sql("INSERT INTO gsort.db.t SELECT CAST(id * 37 % 1000 AS BIGINT), CAST(id AS DOUBLE) FROM range(1000)")
    spark.sql("INSERT INTO gsort.db.t SELECT CAST(id * 53 % 1000 AS BIGINT), CAST(id AS DOUBLE) FROM range(1000)")
    val res = spark.sql(
      "CALL gsort.system.rewrite_data_files(table => 'db.t', strategy => 'sort', target_file_size_bytes => 32768)")
      .head()
    assert(res.getLong(0) >= 2) // both inserts rewritten
    assert(spark.sql("SELECT count(*) FROM gsort.db.t").head().getLong(0) === 2000)

    // explicit sort_order with a TRANSFORM term (same grammar as WRITE
    // ORDERED BY): parses and re-clusters without error
    val res2 = spark.sql(
      "CALL gsort.system.rewrite_data_files(table => 'db.t', strategy => 'sort', " +
        "sort_order => 'bucket(4, id) ASC, v DESC', target_file_size_bytes => 32768)")
      .head()
    assert(res2.getLong(1) >= 1)
    assert(spark.sql("SELECT count(*) FROM gsort.db.t").head().getLong(0) === 2000)
  }

  test("imported files survive column renames (writer-schema name mapping)") {
    val base = Files.createTempDirectory("graft-namemap-").toString
    val ext = s"$base/external"
    orders.limit(50).select("o_orderkey", "o_custkey", "o_orderstatus")
      .write.parquet(ext)
    val t = graft.table.TableImport.importParquet(spark, ext, s"$base/t")
    val originals = orders.limit(50)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // rename a column AFTER import: old files carry no field IDs — reads must
    // resolve through the import-time schema (the name-mapping equivalent;
    // ref core/.../mapping/NameMapping.java)
    t.updateSchema(_.renameColumn("o_custkey", "cust_id"))
    val rows = t.toDF.select("o_orderkey", "cust_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === originals)
    // predicates on the renamed column still push down + prune correctly
    val some = originals.head._2
    assert(t.newScan().filter(graft.meta.expr.Exprs.equalTo("cust_id", some))
      .toDF.count() === originals.count(_._2 == some))
    // and new appends under the new name coexist with imported files
    import spark.implicits._
    t.append(Seq((999999L, 7L, "X")).toDF("o_orderkey", "cust_id", "o_orderstatus"))
    assert(t.toDF.filter(col("cust_id") === 7L).count() ===
      originals.count(_._2 == 7L) + 1)
  }

  test("deleteReachableFiles removes imported external data and the table tree") {
    val base = Files.createTempDirectory("graft-reach-").toString
    // external parquet OUTSIDE the table location (imported in place)
    val ext = s"$base/external"
    orders.limit(50).write.parquet(ext)
    val t = graft.table.TableImport.importParquet(spark, ext, s"$base/t")
    t.append(orders.limit(10)) // plus a native file under the table dir
    assert(t.toDF.count() === 60)
    val extFiles = t.io.listRecursive(ext).map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
    assert(extFiles.nonEmpty)
    val (dataDeleted, metaDeleted) = t.deleteReachableFiles()
    assert(dataDeleted >= extFiles.size + 1) // external + native data files
    assert(metaDeleted > 0)
    assert(extFiles.forall(p => !t.io.exists(p)), "imported external files must be deleted")
    assert(!t.io.exists(s"$base/t"), "table tree must be deleted")
  }

  test("expire snapshots deletes unreachable files, keeps current state") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(100))
    t.delete(graft.meta.expr.Exprs.lessThan("o_orderkey", 1000L)) // rewrites files
    val total = t.toDF.count()
    val dataFilesBefore = t.io.listRecursive(s"$loc/data")
      .count(_.getPath.getName.endsWith(".parquet"))
    val (expired, dataDeleted, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(expired === 1)
    assert(dataDeleted > 0)
    assert(t.toDF.count() === total)
    val dataFilesAfter = t.io.listRecursive(s"$loc/data")
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(dataFilesAfter === dataFilesBefore - dataDeleted)
    // time travel to expired snapshot now fails cleanly
    assert(t.snapshots.size === 1)
  }

  test("concurrent appends all commit via CAS retry, none lost") {
    val loc = tmpLoc()
    // 6 contending writers: raise the retry budget above the default 4
    // (the same knob a busy production table needs)
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema),
      properties = Map(graft.meta.model.TableProperties.CommitRetries -> "20"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futures = (1 to 6).map { i =>
      Future {
        val mine = IceTable.load(spark, loc) // independent handle per writer
        mine.append(orders.limit(10 * i))
      }
    }
    Await.result(Future.sequence(futures), Duration.Inf)
    val fresh = IceTable.load(spark, loc)
    assert(fresh.snapshots.size === 6, "every concurrent append must commit")
    assert(fresh.toDF.count() === (1 to 6).map(_ * 10).sum)
  }

  test("expireSnapshots retainLast ignores snapshots abandoned by rollback") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    (1 to 3).foreach(i => t.append(orders.limit(10 * i)))
    val first = t.snapshots.minBy(_.timestampMillis).snapshotId
    t.rollbackTo(first)
    // the two abandoned (newer) snapshots must NOT consume retain slots:
    // retainLast counts ancestors of the current snapshot only
    val (expired, _, _) = t.expireSnapshots(System.currentTimeMillis() + 1000,
      retainLast = 2)
    assert(expired === 2)
    assert(t.snapshots.map(_.snapshotId) === Seq(first))
    assert(t.toDF.count() === 10)
  }

  test("expireSnapshots retainLast keeps the newest N regardless of age") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    (1 to 4).foreach(i => t.append(orders.limit(10 * i)))
    assert(t.snapshots.size === 4)
    // everything is "old", but the 3 newest must survive
    val (expired, _, _) = t.expireSnapshots(System.currentTimeMillis() + 1000,
      retainLast = 3)
    assert(expired === 1)
    assert(t.snapshots.size === 3)
    assert(t.toDF.count() === 100) // current state intact (10+20+30+40 appended)
  }

  test("orphan file removal deletes only unreferenced files") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(50))
    // plant an orphan
    val orphan = s"$loc/data/orphan-file.parquet"
    orders.limit(3).coalesce(1).write.parquet(s"$loc/data/_orphan_tmp")
    val planted = t.io.listRecursive(s"$loc/data/_orphan_tmp")
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath.toString
    val removed = t.removeOrphanFiles(System.currentTimeMillis() + 1000)
    assert(removed.exists(_.contains("_orphan_tmp")))
    assert(t.toDF.count() === 50) // table intact
  }

  test("valid-file DF reads manifests on executors, not the driver") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    (1 to 3).foreach(_ => t.append(orders.limit(200).repartition(4)))
    val m = t.meta
    val manifests = t.metadataTable("manifests").collect().map(_.getString(0))
    val df = graft.table.Maintenance.validDataFileDF(t, m,
      graft.table.Maintenance.manifestsOf(t, m, m.currentSnapshot.toSeq))
    // plan shape: per-FILE paths must come from an executor-side
    // mapPartitions over manifest paths — the only LocalRelation/LocalTable
    // rows allowed are the manifest paths themselves (#manifests, not #files)
    val plan = org.apache.spark.sql.graft.ColumnBridge.analyzedPlan(df)
    val localRows = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.size
    }
    assert(localRows.forall(_ <= manifests.length),
      s"driver materialized $localRows rows; only manifest paths (${manifests.length}) allowed")
    assert(plan.exists(_.getClass.getSimpleName.contains("MapPartitions")),
      "manifest parsing must run in an executor-side MapPartitions")
    assert(df.count() === t.newScan().planFiles().size)
  }

  test("bulk delete removes files from executors and reports counts") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(10))
    val dir = s"$loc/data/_bulk_tmp"
    (1 to 5).foreach(i => t.io.writeString(s"$dir/f$i.bin", "x"))
    import spark.implicits._
    val df = (1 to 5).map(i => s"$dir/f$i.bin").toDF("path")
    assert(graft.table.Maintenance.bulkDelete(t, df) === 5L)
    assert(t.io.listRecursive(dir).isEmpty)
  }

  test("isolation levels: serializable fails on conflicting concurrent append, snapshot succeeds") {
    import graft.meta.expr.Exprs
    import graft.meta.model.TableProperties
    import graft.table.ConflictValidation
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(100))
    val start = t.currentSnapshot.map(_.snapshotId)
    val victim = t.newScan().planFiles().head.file.path

    // concurrent append lands between the operation's read and its commit
    val t2 = IceTable.load(spark, loc)
    t2.append(orders.limit(10))

    val filter = Exprs.greaterThanOrEqual("o_orderkey", 0L) // overlaps the append
    intercept[graft.table.ValidationException] {
      t.commitSnapshot("delete", Nil, Set(victim),
        validate = Some(ConflictValidation(start, filter,
          TableProperties.IsolationSerializable)))
    }
    // snapshot isolation: appends don't conflict; the delete commits
    t.commitSnapshot("delete", Nil, Set(victim),
      validate = Some(ConflictValidation(start, filter,
        TableProperties.IsolationSnapshot)))
    assert(IceTable.load(spark, loc).snapshots.size === 3)

    // serializable with a DISJOINT conflict filter also commits: the
    // concurrent append's metrics can't match o_orderkey < -1
    val victim2 = t.newScan().planFiles().head.file.path
    t.commitSnapshot("delete", Nil, Set(victim2),
      validate = Some(ConflictValidation(start,
        Exprs.lessThan("o_orderkey", -1L), TableProperties.IsolationSerializable)))
  }

  test("delete via RowOps validates against a concurrent append on retry") {
    import graft.meta.expr.Exprs
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(100))
    // sequential delete: no concurrent commit → validation passes
    t.delete(Exprs.lessThan("o_orderkey", 100000L))
    assert(t.currentSnapshot.get.operation === "delete")
  }

  test("compaction preserves rows committed by a same-sequence upsert delta") {
    // an upsert delta commits (eq-delete keys + replacement rows) at ONE
    // sequence number; the delete applies only to STRICTLY older data. A
    // rewrite that dropped the files' real sequence numbers would apply the
    // delta's own delete to its own rows and silently lose them.
    val loc = tmpLoc()
    import spark.implicits._
    val df0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val t = IceTable.create(spark, loc, Schema.fresh(df0.schema))
    t.append(df0.coalesce(1))
    graft.table.MergeOnRead.upsertDelta(t, Seq("k"),
      Seq((2L, "B"), (4L, "d")).toDF("k", "v").coalesce(1))
    def state() = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d"))
    assert(state() === expected)
    t.rewriteDataFiles()
    assert(state() === expected, "compaction lost same-sequence upsert rows")
    t.removeDanglingDeletes()
    assert(state() === expected)
    assert(t.newScan().planDeletes().isEmpty)
  }

  test("removeDanglingDeletes drops deletes that no live data file can match") {
    import graft.meta.expr.Exprs._
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(60).repartition(3))
    // one position-delete and one equality-delete commit
    val victim = orders.limit(1).collect().head.getAs[Long]("o_orderkey")
    t.deleteMergeOnRead(equalTo("o_orderkey", victim))
    t.addEqualityDeletes(orders.limit(5).filter(col("o_orderkey") =!= victim)
      .limit(2).select("o_orderkey"), Seq("o_orderkey"))
    val expected = t.toDF.count()
    assert(t.newScan().planDeletes().size >= 2)
    // still applicable (data older than the deletes): nothing to remove
    assert(t.removeDanglingDeletes() === 0)
    // compaction re-sequences every data file past the deletes
    t.rewriteDataFiles()
    assert(t.toDF.count() === expected)
    val removed = t.removeDanglingDeletes()
    assert(removed >= 2, s"expected all delete files dangling, removed $removed")
    assert(t.newScan().planDeletes().isEmpty)
    assert(t.toDF.count() === expected)
  }

  test("rewritePositionDeleteFiles compacts delete files and drops dead rows") {
    import graft.meta.expr.Exprs._
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    t.append(orders.limit(80).repartition(2))
    // three DML commits → three position-delete files
    val keys = orders.limit(6).collect().map(_.getAs[Long]("o_orderkey"))
    keys.grouped(2).foreach { ks =>
      t.deleteMergeOnRead(in("o_orderkey", ks.toSeq: _*))
    }
    val expected = t.toDF.count()
    assert(expected === 80 - 6)
    val before = t.newScan().planDeletes()
    assert(before.size === 3)
    val (rw, add) = t.rewritePositionDeleteFiles()
    assert(rw === 3 && add === 1, s"expected 3 -> 1, got $rw -> $add")
    assert(t.newScan().planDeletes().size === 1)
    assert(t.toDF.count() === expected)
    // a CoW delete rewrites one file: its position-delete rows go dead and
    // the next rewrite drops them (row count of the delete file shrinks)
    val deadKey = orders.limit(80).filter(col("o_orderkey") > keys.max)
      .limit(1).collect().head.getAs[Long]("o_orderkey")
    t.delete(equalTo("o_orderkey", deadKey)) // CoW: rewrites the file
    val liveRows = t.newScan().planDeletes().map(_._1.recordCount).sum
    t.rewritePositionDeleteFiles()
    val after = t.newScan().planDeletes()
    assert(after.map(_._1.recordCount).sum < liveRows,
      s"dead rows not dropped: before $liveRows, after ${after.map(_._1.recordCount).sum}")
    assert(t.toDF.count() === expected - 1)
  }

  test("convertEqualityDeletes: eq deletes become position deletes, rows unchanged") {
    import spark.implicits._
    val loc = tmpLoc()
    val df0 = (1L to 30L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = IceTable.create(spark, loc, Schema.fresh(df0.schema))
    t.append(df0.coalesce(1))
    // history exercising the sequence rule: delete ks, re-insert SOME of
    // them (newer than the delete → must survive), second delete on other
    // keys, plus a position delete in the mix
    t.addEqualityDeletes(Seq(2L, 4L, 6L).toDF("k"), Seq("k"))
    t.append(Seq((4L, "v4b"), (6L, "v6b")).toDF("k", "v").coalesce(1))
    t.addEqualityDeletes(Seq("v9", "v6b").toDF("v"), Seq("v"))
    t.deleteMergeOnRead(graft.meta.expr.Exprs.equalTo("k", 11L))
    def state() = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val before = state()
    assert(!before.exists(r => Set(2L, 9L, 11L).contains(r._1)))
    assert(before.contains((4L, "v4b")) && !before.exists(_._2 == "v6b"))
    val eqCount = t.newScan().planDeletes()
      .count(_._1.content == graft.meta.model.FileContent.EqualityDeletes)
    assert(eqCount >= 2)
    val (converted, added) = t.convertEqualityDeletes()
    assert(converted === eqCount && added >= 1)
    // every live delete file is now positional; rows identical
    val remaining = t.newScan().planDeletes()
    assert(remaining.nonEmpty && remaining.forall(
      _._1.content == graft.meta.model.FileContent.PositionDeletes))
    assert(state() === before, "conversion changed visible rows")
    // converting again is a no-op; downstream delete maintenance composes
    assert(t.convertEqualityDeletes() === ((0, 0)))
    t.rewritePositionDeleteFiles()
    assert(state() === before)
    t.rewriteDataFiles()
    t.removeDanglingDeletes()
    assert(state() === before)
    assert(t.newScan().planDeletes().isEmpty)
    // CALL surface
    spark.conf.set("spark.sql.catalog.gced", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gced.warehouse",
      Files.createTempDirectory("graft-ced-").toString)
    spark.sql("CREATE TABLE gced.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gced.db.t SELECT id, concat('v', id) FROM range(50)")
    val ct = IceTable.load(spark,
      spark.conf.get("spark.sql.catalog.gced.warehouse") + "/db/t")
    ct.addEqualityDeletes(Seq(5L, 15L).toDF("id"), Seq("id"))
    val r = spark.sql("CALL gced.system.convert_equality_deletes(table => 'db.t')")
      .collect().head
    assert(r.getLong(0) >= 1 && r.getLong(1) >= 1)
    assert(spark.sql("SELECT count(*) FROM gced.db.t").head().getLong(0) === 48)
  }

  test("maintain autopilot: one call runs the gated action chain") {
    import spark.implicits._
    val loc = tmpLoc()
    val df0 = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v")
    val t = IceTable.create(spark, loc, Schema.fresh(df0.schema),
      properties = Map(
        "write.delete.mode" -> "merge-on-read",
        "maintenance.rewrite-manifests.min-count" -> "3",
        "history.expire.max-snapshot-age-ms" -> "0",
        "history.expire.min-snapshots-to-keep" -> "2"))
    // mess: 4 append commits (4 manifests), 2 MoR deletes (pos files),
    // 1 eq-delete commit, all snapshots old enough to expire
    (0 to 3).foreach(i => t.append(df0.filter(col("k") % 4 === i).coalesce(1)))
    t.deleteMergeOnRead(graft.meta.expr.Exprs.equalTo("k", 5L))
    t.deleteMergeOnRead(graft.meta.expr.Exprs.equalTo("k", 6L))
    t.addEqualityDeletes(Seq(7L, 8L).toDF("k"), Seq("k"))
    def state() = t.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val before = state()
    assert(before.size === 196)
    val r = t.maintain()
    // every stage did real work, visible rows never changed
    assert(r.convertedEqDeletes >= 1, r.toString)
    assert(r.compactedDataFiles >= 2, r.toString)
    assert(r.danglingDeletesRemoved >= 1, r.toString)
    // the compaction/conversion commits may already have consolidated
    // manifests under the threshold — the gate skipping then is CORRECT;
    // the post-condition is what matters
    assert(t.metadataTable("manifests").count() <= 3, r.toString)
    assert(r.expiredSnapshots >= 1, r.toString)
    assert(r.orphansRemoved === 0, "orphan removal must be opt-in")
    assert(state() === before, "maintain changed visible rows")
    // post-state: no delete files survive; the PRE-maintain history is
    // trimmed (the autopilot's own commits are newer than the cutoff and
    // rightly survive — only the 7 original snapshots were expirable)
    assert(t.newScan().planDeletes().isEmpty)
    assert(t.meta.snapshots.size <= 5, t.meta.snapshots.size.toString)
    // a second run converges to near-no-ops
    val r2 = t.maintain()
    assert(r2.convertedEqDeletes === 0 && r2.rewrittenDeleteFiles === 0 &&
      r2.danglingDeletesRemoved === 0, r2.toString)
    assert(state() === before)
    // CALL surface
    spark.conf.set("spark.sql.catalog.gmt2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmt2.warehouse",
      Files.createTempDirectory("graft-mt2-").toString)
    spark.sql("CREATE TABLE gmt2.db.t (id BIGINT, v STRING) TBLPROPERTIES" +
      "('write.delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO gmt2.db.t SELECT id, concat('v', id) FROM range(60)")
    spark.sql("INSERT INTO gmt2.db.t SELECT id + 60, concat('v', id) FROM range(60)")
    spark.sql("DELETE FROM gmt2.db.t WHERE id = 3")
    val row = spark.sql("CALL gmt2.system.maintain(table => 'db.t')").head()
    assert(row.length === 7)
    assert(spark.sql("SELECT count(*) FROM gmt2.db.t").head().getLong(0) === 119)
  }

  test("CALL rewrite_position_delete_files / remove_dangling_deletes") {
    val base = Files.createTempDirectory("graft-calls-").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gmnt", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmnt.warehouse", base)
    spark.sql("CREATE TABLE gmnt.db.t (id BIGINT, v STRING) TBLPROPERTIES" +
      "('write.delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO gmnt.db.t SELECT id, concat('v', id) FROM range(100)")
    spark.sql("DELETE FROM gmnt.db.t WHERE id = 3")
    spark.sql("DELETE FROM gmnt.db.t WHERE id = 7")
    val r = spark.sql("CALL gmnt.system.rewrite_position_delete_files(table => 'db.t')")
      .collect().head
    assert(r.getLong(0) === 2 && r.getLong(1) === 1)
    assert(spark.sql("SELECT count(*) FROM gmnt.db.t").head().getLong(0) === 98)
    // compact, then the delete file dangles
    spark.sql("CALL gmnt.system.rewrite_data_files(table => 'db.t')")
    val d = spark.sql("CALL gmnt.system.remove_dangling_deletes(table => 'db.t')")
      .collect().head
    assert(d.getLong(0) === 1)
    assert(spark.sql("SELECT count(*) FROM gmnt.db.t").head().getLong(0) === 98)
  }

  test("rewriteManifests compacts to one manifest per spec") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    (1 to 4).foreach(_ => t.append(orders.limit(20)))
    assert(t.metadataTable("manifests").count() === 4)
    val n = t.rewriteManifests()
    assert(n === 1)
    assert(t.toDF.count() === 80)
  }

  test("metadata tables: snapshots/files/partitions/history/manifests/entries") {
    val loc = tmpLoc()
    val schema = Schema.fresh(orders.schema)
    val spec = PartitionSpec.builderFor(schema).identity("o_orderstatus").build()
    val t = IceTable.create(spark, loc, schema, spec)
    t.append(orders)
    t.append(orders.limit(10))
    assert(t.metadataTable("snapshots").count() === 2)
    assert(t.metadataTable("history").count() === 2)
    val files = t.metadataTable("files")
    assert(files.count() === t.newScan().planFiles().size)
    val parts = t.metadataTable("partitions").collect()
    assert(parts.map(_.getLong(1)).sum === orders.count() + 10)
    assert(t.metadataTable("manifests").count() === 2)
    assert(t.metadataTable("entries").count() === files.count())
    // differential: partitions table record counts match groupBy on source
    val exp = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    parts.foreach { r =>
      val status = r.getString(0).split("=")(1)
      val base = exp(status)
      val extra = orders.limit(10).filter(col("o_orderstatus") === status).count()
      assert(r.getLong(1) === base + extra)
    }
  }

  test("streaming: idempotent epoch sink + incremental reader") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(orders.schema))
    val sink = Streaming.appendSink(t, "q1")
    sink(orders.limit(10), 0L)
    sink(orders.limit(5), 1L)
    sink(orders.limit(5), 1L) // replay: must be skipped
    assert(t.toDF.count() === 15)
    assert(Streaming.lastCommittedEpoch(t, "q1") === Some(1L))
    val reader = new Streaming.IncrementalReader(t, s"$loc/checkpoint.txt")
    val (b1, off1) = reader.next().get
    assert(b1.count() === 15) // first call: everything
    reader.commit(off1)
    assert(reader.next().isEmpty) // caught up
    sink(orders.limit(7), 2L)
    val (b2, off2) = reader.next().get
    assert(b2.count() === 7) // only the new epoch
    reader.commit(off2)
    assert(reader.next().isEmpty)
  }
}
