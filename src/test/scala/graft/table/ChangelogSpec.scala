package graft.table

import java.nio.file.Files

import graft.SparkSessionHelper
import graft.meta.Schema
import graft.meta.expr.Exprs._
import graft.meta.model.{Operation, TableProperties}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level CDC changelog: change types, commit attribution, dense
  * ordinals, carryover cancellation, lineage validation, and the
  * lineage-bounded manifest IO guarantee. */
class ChangelogSpec extends AnyFunSuite {
  import SparkSessionHelper._
  import spark.implicits._

  private def tmpLoc(): String =
    Files.createTempDirectory("graft-cdc-").toString + "/t"

  private def kv(pairs: (Long, String)*) =
    pairs.toDF("k", "v").repartition(1)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long, Int)] =
    df.select("k", "v", Changelog.ChangeTypeCol, Changelog.SnapshotIdCol,
        Changelog.OrdinalCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4))).toSet

  test("appends emit inserts with commit snapshot ids and dense ordinals") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a", 2L -> "b"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.append(kv(3L -> "c"))
    val s2 = t.currentSnapshot.get.snapshotId
    assert(rows(t.changelog()) === Set(
      (1L, "a", Changelog.Insert, s1, 0),
      (2L, "b", Changelog.Insert, s1, 0),
      (3L, "c", Changelog.Insert, s2, 1)))
  }

  test("CoW delete emits only the net deleted rows (carryovers cancelled)") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.delete(equalTo("k", 2L))
    val s2 = t.currentSnapshot.get.snapshotId
    // the rewrite copied rows 1 and 3 into a new file; they must cancel
    assert(rows(t.changelog(fromId = Some(s1))) ===
      Set((2L, "b", Changelog.Delete, s2, 0)))
  }

  test("CoW update emits delete(old)+insert(new) under one snapshot") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a", 2L -> "b"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.update(equalTo("k", 1L), Map("v" -> lit("A")))
    val s2 = t.currentSnapshot.get.snapshotId
    assert(rows(t.changelog(fromId = Some(s1))) === Set(
      (1L, "a", Changelog.Delete, s2, 0),
      (1L, "A", Changelog.Insert, s2, 0)))
  }

  test("merge-on-read delete emits the suppressed rows as deletes") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.deleteMergeOnRead(in("k", 1L, 3L))
    val s2 = t.currentSnapshot.get.snapshotId
    assert(rows(t.changelog(fromId = Some(s1))) === Set(
      (1L, "a", Changelog.Delete, s2, 0),
      (3L, "c", Changelog.Delete, s2, 0)))
  }

  test("merge-on-read update emits delete(old)+insert(new), same commit") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema),
      properties = Map(TableProperties.UpdateMode -> TableProperties.RowLevelMergeOnRead))
    t.append(kv(1L -> "a", 2L -> "b"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.update(equalTo("k", 2L), Map("v" -> lit("B")))
    val s2 = t.currentSnapshot.get.snapshotId
    assert(rows(t.changelog(fromId = Some(s1))) === Set(
      (2L, "b", Changelog.Delete, s2, 0),
      (2L, "B", Changelog.Insert, s2, 0)))
  }

  test("equality deletes emit the suppressed rows as deletes") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a", 2L -> "b", 3L -> "a"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.addEqualityDeletes(Seq("a").toDF("v"), Seq("v"))
    val s2 = t.currentSnapshot.get.snapshotId
    assert(rows(t.changelog(fromId = Some(s1))) === Set(
      (1L, "a", Changelog.Delete, s2, 0),
      (3L, "a", Changelog.Delete, s2, 0)))
  }

  test("compaction snapshots are skipped and consume no ordinal") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a"))
    t.append(kv(2L -> "b"))
    t.rewriteDataFiles()
    assert(t.currentSnapshot.get.operation === Operation.Replace)
    t.delete(equalTo("k", 1L))
    val sDel = t.currentSnapshot.get.snapshotId
    val out = rows(t.changelog())
    // no rows attributed to the replace snapshot, and the delete's ordinal
    // is dense (2, not 3)
    assert(out.collect { case (_, _, Changelog.Delete, sid, ord) => (sid, ord) } ===
      Set((sDel, 2)))
    assert(out.map(_._5) === Set(0, 1, 2))
  }

  test("a from snapshot that is not an ancestor is rejected") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.append(kv(2L -> "b"))
    val s2 = t.currentSnapshot.get.snapshotId
    t.rollbackTo(s1)
    t.append(kv(3L -> "c"))
    val e = intercept[IllegalArgumentException](t.changelog(fromId = Some(s2)).count())
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("an expired from snapshot fails loudly instead of replaying the table") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.append(kv(2L -> "b"))
    t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    assert(t.meta.snapshot(s1).isEmpty)
    val e = intercept[IllegalArgumentException](t.changelog(fromId = Some(s1)).count())
    assert(e.getMessage.contains("expired"))
  }

  test("unknown to is rejected; from == to yields an empty changelog") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a"))
    val cur = t.currentSnapshot.get.snapshotId
    intercept[ValidationException](t.changelog(toId = Some(123456789L)))
    val df = t.changelog(fromId = Some(cur), toId = Some(cur))
    assert(df.count() === 0)
    assert(df.columns.contains(Changelog.ChangeTypeCol))
  }

  test("windowed range (from, to] excludes both history before from and after to") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    t.append(kv(1L -> "a"))
    val s1 = t.currentSnapshot.get.snapshotId
    t.append(kv(2L -> "b"))
    val s2 = t.currentSnapshot.get.snapshotId
    t.append(kv(3L -> "c"))
    assert(rows(t.changelog(fromId = Some(s1), toId = Some(s2))) ===
      Set((2L, "b", Changelog.Insert, s2, 0)))
  }

  test("manifest IO is lineage-bounded: each manifest is read at most once") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(kv().schema))
    (1 to 6).foreach(i => t.append(kv(i.toLong -> s"v$i")))
    t.delete(equalTo("k", 3L))
    val m = t.meta
    // distinct manifest paths across every snapshot's manifest list — the
    // ceiling a once-per-path walk can hit (the naive per-snapshot walk
    // would read ~O(snapshots^2/2) manifests here)
    val distinctPaths = m.snapshots
      .flatMap(s => t.readManifestList(m, s)).map(_.path).distinct.size
    val perSnapshotSum = m.snapshots
      .map(s => t.readManifestList(m, s).count(_.hasLiveFiles)).sum
    val before = ManifestIO.readCounter.get()
    val out = t.changelog()
    assert(out.count() === 6 + 1) // 6 inserts + 1 net delete
    val delta = ManifestIO.readCounter.get() - before
    assert(delta <= distinctPaths,
      s"changelog read $delta manifests, > $distinctPaths distinct paths")
    assert(delta < perSnapshotSum,
      s"changelog read $delta manifests — not better than the naive $perSnapshotSum")
  }
}
