package graft

import java.nio.file.Files

import graft.meta.Schema
import graft.meta.model.{JsonCodecs, SnapshotRefMeta}
import graft.table.{IceTable, ValidationException}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot branches and tags: named refs in table metadata, branch-targeted
  * commits, ref reads (API + SQL `VERSION AS OF 'name'`), fast-forward
  * publish, and ref-aware snapshot expiry. */
class BranchSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private def tmpLoc(): String =
    Files.createTempDirectory("graft-branch-").toString + "/t"

  private lazy val customer: DataFrame =
    Tables.load(spark, sf0001, "customer").cache()

  private def evens = customer.filter(col("c_custkey") % 2 === 0)
  private def odds = customer.filter(col("c_custkey") % 2 =!= 0)

  test("create/list/remove branches and tags; duplicates and main rejected") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.createBranch("dev")
    t.createTag("v1")
    assert(t.refs.keySet === Set("dev", "v1"))
    assert(t.refs("dev").refType === SnapshotRefMeta.Branch)
    assert(t.refs("v1").refType === SnapshotRefMeta.Tag)
    assert(t.refs("dev").snapshotId === t.currentSnapshot.get.snapshotId)
    intercept[ValidationException](t.createBranch("dev"))
    intercept[ValidationException](t.createTag("dev"))
    intercept[ValidationException](t.createBranch("main"))
    intercept[ValidationException](t.createBranch("x", snapshotId = Some(42L)))
    t.removeRef("v1")
    assert(t.refs.keySet === Set("dev"))
    intercept[ValidationException](t.removeRef("v1"))
  }

  test("branch commits advance only the branch; main is isolated") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    val mainHead = t.currentSnapshot.get.snapshotId
    t.createBranch("audit")
    t.appendToBranch("audit", odds)
    // main unchanged, branch sees both halves
    assert(t.currentSnapshot.get.snapshotId === mainHead)
    assert(t.toDF.count() === evens.count())
    assert(t.newScan().useRef("audit").toDF.count() === customer.count())
    // the branch snapshot's parent is the branch head it grew from
    val bid = t.refs("audit").snapshotId
    assert(t.snapshots.find(_.snapshotId === bid).get.parentId === Some(mainHead))
    // useRef("main") is the plain current scan
    assert(t.newScan().useRef("main").toDF.count() === evens.count())
    intercept[ValidationException](t.newScan().useRef("nope"))
  }

  test("tags are immutable: committing to a tag fails") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.createTag("rel")
    intercept[ValidationException](t.appendToBranch("rel", odds))
    intercept[ValidationException](t.replaceBranch("rel", t.currentSnapshot.get.snapshotId))
  }

  test("fast-forward publishes a branch onto main; requires descendant") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.createBranch("audit")
    t.appendToBranch("audit", odds)
    val branchHead = t.refs("audit").snapshotId
    t.fastForward("main", branchHead)
    assert(t.toDF.count() === customer.count())
    assert(t.currentSnapshot.get.snapshotId === branchHead)
    // a non-descendant target is rejected: divergent main commit, then try
    // to fast-forward the stale branch head onto it
    t.append(customer.limit(1))
    intercept[ValidationException](t.fastForward("main", branchHead))
    // branch fast-forward to a descendant of ITS head works
    t.appendToBranch("audit", customer.limit(1))
    val b2 = t.refs("audit").snapshotId
    t.replaceBranch("audit", branchHead) // rewind
    t.fastForward("audit", b2)
    assert(t.refs("audit").snapshotId === b2)
  }

  test("SQL: VERSION AS OF resolves branch and tag names; refs metadata table") {
    val wh = Files.createTempDirectory("graft-branch-sql-").toString
    spark.conf.set("spark.sql.catalog.gbr", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    evens.createOrReplaceTempView("branch_evens")
    spark.sql("CREATE TABLE gbr.db.c AS SELECT * FROM branch_evens")
    val t = IceTable.load(spark, s"$wh/db/c")
    t.createBranch("dev")
    t.appendToBranch("dev", odds)
    t.createTag("v1") // at main head (evens only)
    assert(spark.sql("SELECT * FROM gbr.db.c").count() === evens.count())
    assert(spark.sql("SELECT * FROM gbr.db.c VERSION AS OF 'dev'").count()
      === customer.count())
    assert(spark.sql("SELECT * FROM gbr.db.c VERSION AS OF 'v1'").count()
      === evens.count())
    assert(spark.sql("SELECT * FROM gbr.db.c VERSION AS OF 'main'").count()
      === evens.count())
    intercept[Exception](
      spark.sql("SELECT * FROM gbr.db.c VERSION AS OF 'ghost'").count())
    // refs metadata table lists main + both refs with types
    val refRows = spark.sql(
      "SELECT name, type, snapshot_id FROM gbr.db.c.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refRows === Seq(("dev", "branch"), ("main", "branch"), ("v1", "tag")))
  }

  test("SQL DDL: CREATE/DROP BRANCH and TAG, fast_forward procedure") {
    val wh = Files.createTempDirectory("graft-branch-ddl-").toString
    spark.conf.set("spark.sql.catalog.gbd", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbd.warehouse", wh)
    evens.createOrReplaceTempView("branch_ddl_evens")
    spark.sql("CREATE TABLE gbd.db.c AS SELECT * FROM branch_ddl_evens")
    spark.sql("ALTER TABLE gbd.db.c CREATE BRANCH audit")
    spark.sql("ALTER TABLE gbd.db.c CREATE TAG v1")
    val t = IceTable.load(spark, s"$wh/db/c")
    assert(t.refs.keySet === Set("audit", "v1"))
    t.appendToBranch("audit", odds)
    // publish: fast_forward main onto the audited branch
    val row = spark.sql(
      "CALL gbd.system.fast_forward('db.c', 'main', 'audit')").collect().head
    assert(row.getString(0) === "main")
    assert(spark.sql("SELECT * FROM gbd.db.c").count() === customer.count())
    // branch at an explicit older version
    val v1Snap = IceTable.load(spark, s"$wh/db/c").refs("v1").snapshotId
    spark.sql(s"ALTER TABLE gbd.db.c CREATE BRANCH old AS OF VERSION $v1Snap")
    assert(spark.sql("SELECT * FROM gbd.db.c VERSION AS OF 'old'").count()
      === evens.count())
    spark.sql("ALTER TABLE gbd.db.c DROP BRANCH old")
    spark.sql("ALTER TABLE gbd.db.c DROP TAG v1")
    assert(IceTable.load(spark, s"$wh/db/c").refs.keySet === Set("audit"))
  }

  test("expire retains ref-reachable snapshots; aged-out refs die") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    val s1 = t.currentSnapshot.get.snapshotId
    t.createTag("keepme") // pins s1 forever (no max-ref-age)
    t.createTag("fleeting", maxRefAgeMs = Some(0L)) // ages out immediately
    t.append(odds)
    // expire everything older than now except the current snapshot
    val (expired, _, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    // s1 survives: the live tag pins it; the aged tag is gone
    assert(t.refs.keySet === Set("keepme"))
    assert(t.snapshots.map(_.snapshotId).contains(s1))
    assert(expired === 0)
    // time travel to the pinned snapshot still works
    assert(t.newScan().useRef("keepme").toDF.count() === evens.count())
    // drop the tag: now the old snapshot expires and its files are removed
    t.removeRef("keepme")
    val (expired2, _, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(expired2 === 1)
    assert(!t.snapshots.map(_.snapshotId).contains(s1))
    assert(t.toDF.count() === customer.count())
  }

  test("branch ancestry retention: min-snapshots-to-keep bounds the prefix") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.append(odds)
    t.append(customer.limit(1))
    // branch at head with a 2-snapshot retention window
    t.createBranch("b", minSnapshotsToKeep = Some(2))
    val ancestry = {
      val m = t.snapshots.map(s => s.snapshotId -> s).toMap
      Iterator.iterate(Option(m(t.refs("b").snapshotId)))(
        _.flatMap(_.parentId).flatMap(m.get)).takeWhile(_.isDefined).flatten
        .map(_.snapshotId).toSeq
    }
    assert(ancestry.size === 3)
    val (expired, _, _) = t.expireSnapshots(System.currentTimeMillis() + 1000,
      retainLast = 2)
    // main retains 2 (head + parent) and the branch window wants the same 2;
    // the oldest ancestor expires
    assert(expired === 1)
    assert(!t.snapshots.map(_.snapshotId).contains(ancestry.last))
    assert(t.snapshots.map(_.snapshotId).toSet === ancestry.take(2).toSet)
  }

  test("DataFrame options: read branch/tag, write to branch") {
    val wh = Files.createTempDirectory("graft-branch-opt-").toString
    spark.conf.set("spark.sql.catalog.gbo", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbo.warehouse", wh)
    evens.createOrReplaceTempView("branch_opt_evens")
    spark.sql("CREATE TABLE gbo.db.c AS SELECT * FROM branch_opt_evens")
    val loc = s"$wh/db/c"
    val t = IceTable.load(spark, loc)
    t.createBranch("dev")
    t.createTag("v1")
    // write-to-branch via writeTo option; main untouched
    odds.writeTo("gbo.db.c").option("branch", "dev").append()
    assert(spark.read.format("graft").load(loc).count() === evens.count())
    assert(spark.read.format("graft").option("branch", "dev").load(loc).count()
      === customer.count())
    assert(spark.read.format("graft").option("tag", "v1").load(loc).count()
      === evens.count())
    assert(spark.read.format("graft").option("branch", "main").load(loc).count()
      === evens.count())
    intercept[Exception](
      spark.read.format("graft").option("branch", "nope").load(loc).count())
    // overwrite cannot target a branch
    intercept[Exception](
      odds.writeTo("gbo.db.c").option("branch", "dev").overwritePartitions())
  }

  test("metadata_log_entries lists prior metadata versions") {
    val loc = tmpLoc()
    val t = IceTable.create(spark, loc, Schema.fresh(customer.schema))
    t.append(evens)
    t.append(odds)
    val log = t.metadataTable("metadata_log_entries").collect()
    assert(log.length >= 2) // create + first append at least
    assert(log.forall(_.getString(1).contains("metadata")))
    // the latest entry resolves to a snapshot that existed at that time
    assert(log.last.get(2) != null)
  }

  test("refs round-trip through metadata JSON") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.createBranch("dev", minSnapshotsToKeep = Some(3),
      maxSnapshotAgeMs = Some(1234L))
    t.createTag("v1", maxRefAgeMs = Some(99999L))
    val m = t.meta
    val parsed = JsonCodecs.tableMetadataFromJson(
      JsonCodecs.tableMetadataToJson(m))
    assert(parsed.refs === m.refs)
    assert(parsed.refs("dev").minSnapshotsToKeep === Some(3))
    assert(parsed.refs("dev").maxSnapshotAgeMs === Some(1234L))
    assert(parsed.refs("v1").maxRefAgeMs === Some(99999L))
  }

  test("concurrent branch and main commits both land (CAS retry)") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(customer.schema))
    t.append(evens)
    t.createBranch("dev")
    // interleave: a main append between branch-commit metadata read and
    // publish is resolved by the commit retry loop
    val t2 = IceTable.load(spark, t.location)
    t2.append(customer.limit(5))
    t.appendToBranch("dev", odds)
    assert(t.newScan().useRef("dev").toDF.count() === customer.count())
    assert(t.toDF.count() === evens.count() + 5)
  }
}
