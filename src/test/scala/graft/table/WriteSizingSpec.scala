package graft.table

import java.nio.file.Files

import graft.SparkSessionHelper
import graft.meta.Schema
import graft.meta.expr.Exprs._
import graft.meta.model.TableProperties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side file sizing: running snapshot totals (total-records /
  * total-files-size) and target-file-size rolling derived from them. */
class WriteSizingSpec extends AnyFunSuite {
  import SparkSessionHelper._
  import spark.implicits._

  private def tmpLoc(): String =
    Files.createTempDirectory("graft-sizing-").toString + "/t"

  private def rows(n: Int, offset: Int = 0) =
    (1 to n).map(i => ((offset + i).toLong, "x" * 100)).toDF("id", "pad")
      .repartition(1)

  test("snapshot summaries carry running total-records / total-files-size") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(rows(1).schema))
    t.append(rows(100))
    val s1 = t.currentSnapshot.get.summary
    assert(s1("total-records").toLong === 100L)
    assert(s1("total-files-size").toLong > 0L)
    assert(s1("added-files-size").toLong === s1("total-files-size").toLong)
    t.append(rows(50, offset = 100))
    val s2 = t.currentSnapshot.get.summary
    assert(s2("total-records").toLong === 150L)
    assert(s2("total-files-size").toLong > s1("total-files-size").toLong)
    // CoW delete rewrites: totals track live data, not bytes ever written
    t.delete(lessThanOrEqual("id", 100L))
    val s3 = t.currentSnapshot.get.summary
    assert(s3("total-records").toLong === 50L)
    assert(s3("removed-files-size").toLong > 0L)
    val liveBytes = t.newScan().planFiles().map(_.file.fileSizeBytes).sum
    assert(s3("total-files-size").toLong === liveBytes)
  }

  test("MoR delete commits track tombstones separately from data totals") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(rows(1).schema))
    t.append(rows(100))
    val before = t.currentSnapshot.get.summary
    // a MoR DELETE of 30 rows adds a position-delete file; total-records and
    // added-records must NOT count the tombstones (ADVICE r6: they did)
    t.deleteMergeOnRead(lessThanOrEqual("id", 30L))
    val s = t.currentSnapshot.get.summary
    assert(s("total-records").toLong === before("total-records").toLong,
      "MoR delete must not change total-records (rows are masked, not gone)")
    assert(s.getOrElse("added-records", "0").toLong === 0L)
    assert(s("added-data-files").toInt === 0)
    assert(s("added-delete-files").toInt >= 1)
    assert(s("added-position-deletes").toLong === 30L)
    assert(s("total-position-deletes").toLong === 30L)
    assert(s("total-delete-files").toInt >= 1)
    assert(s("total-data-files").toInt === before("total-data-files").toInt)
    // equality deletes land in their own counter
    t.addEqualityDeletes(Seq(31L).toDF("id"), Seq("id"))
    val s2 = t.currentSnapshot.get.summary
    assert(s2("added-equality-deletes").toLong === 1L)
    assert(s2("total-equality-deletes").toLong === 1L)
    assert(s2("total-position-deletes").toLong === 30L)
    assert(s2("total-records").toLong === before("total-records").toLong)
    // compacting (then dropping the dangling tombstones) brings the delete
    // totals back down
    t.rewriteDataFiles(minInputFiles = 1)
    t.removeDanglingDeletes()
    val s3 = t.currentSnapshot.get.summary
    assert(s3("total-records").toLong === 69L)
    assert(s3("total-position-deletes").toLong === 0L)
    assert(s3("total-equality-deletes").toLong === 0L)
    assert(s3("total-delete-files").toInt === 0)
  }

  test("appends roll files at ~target size once a row-width estimate exists") {
    val t = IceTable.create(spark, tmpLoc(), Schema.fresh(rows(1).schema))
    // first write: no estimate → single file from the single task
    t.append(rows(500))
    assert(t.newScan().planFiles().size === 1)
    val s1 = t.currentSnapshot.get.summary
    val width = s1("total-files-size").toLong / s1("total-records").toLong
    // target ≈ 100 rows worth of bytes → a 500-row single-task append must
    // roll into ~5 files instead of one
    t.append(rows(500), Map.empty,
      writeOverrides = Map(TableProperties.TargetFileSize -> (width * 100).toString))
    val added = t.currentSnapshot.get.summary("added-data-files").toInt
    assert(added >= 3, s"expected rolled files, got $added")
  }
}
