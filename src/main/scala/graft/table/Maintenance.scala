package graft.table

import java.util.UUID

import graft.meta.model._

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Table-maintenance actions implemented as Spark DataFrame programs, like
  * the reference's spark actions module (ref
  * `spark/.../actions/BaseExpireSnapshotsSparkAction.java:157`,
  * `BaseDeleteOrphanFilesSparkAction.java:164`,
  * `BaseRewriteDataFilesSparkAction.java:120`, `BinPackStrategy.java:134`,
  * `BaseRewriteManifestsSparkAction.java`). File-set diffs are `except` /
  * `left_anti` jobs so they scale to metadata far beyond driver memory.
  */
object Maintenance {

  // ------------------------------------------------------------ expire

  /** Remove snapshots older than `olderThanMillis` (never the current one),
    * then delete files only reachable from the expired snapshots via a
    * DataFrame `except` between the before/after valid-file sets. Returns
    * (#snapshots expired, #data files deleted, #manifests deleted). */
  def expireSnapshots(table: IceTable, olderThanMillis: Long): (Int, Long, Long) = {
    val spark = table.spark
    val before = table.meta
    val expired = before.snapshots.filter(s =>
      s.timestampMillis < olderThanMillis &&
        !before.currentSnapshotId.contains(s.snapshotId))
    if (expired.isEmpty) return (0, 0L, 0L)
    val expiredIds = expired.map(_.snapshotId).toSet

    table.ops.commitWithRetry(4) { base =>
      val keep = base.snapshots.filterNot(s => expiredIds.contains(s.snapshotId))
      base.copy(
        snapshots = keep,
        snapshotLog = base.snapshotLog.filterNot(e => expiredIds.contains(e.snapshotId)),
        lastUpdatedMillis = System.currentTimeMillis())
    }

    // valid files before vs after (distributed diff)
    import spark.implicits._
    val after = table.meta
    def fileDF(m: TableMetadata, snaps: Seq[SnapshotMeta]): DataFrame = {
      val (dataPaths, manifestPaths) = reachableFiles(table, m, snaps)
      (dataPaths.toDF("path"), manifestPaths.toDF("path")) match {
        case (d, mm) => d.withColumn("kind", lit("data"))
          .unionAll(mm.withColumn("kind", lit("manifest")))
      }
    }
    val beforeDF = fileDF(before, before.snapshots)
    val afterDF = fileDF(after, after.snapshots)
    val orphaned = beforeDF.except(afterDF).collect() // expired-only files
    var dataDeleted = 0L; var manifestsDeleted = 0L
    orphaned.foreach { r =>
      if (table.io.delete(r.getString(0))) {
        if (r.getString(1) == "data") dataDeleted += 1 else manifestsDeleted += 1
      }
    }
    expired.foreach(s => table.io.delete(s.manifestList))
    (expired.size, dataDeleted, manifestsDeleted)
  }

  private def reachableFiles(table: IceTable, m: TableMetadata,
      snaps: Seq[SnapshotMeta]): (Seq[String], Seq[String]) = {
    val manifests = snaps.flatMap { s =>
      try table.readManifestList(m, s) catch { case _: Exception => Nil }
    }.distinctBy(_.path)
    val dataPaths = manifests.flatMap { mf =>
      try ManifestIO.read(table.io, mf.path, m.schema, m.specById)
        .map(_.dataFile.path)
      catch { case _: Exception => Nil }
    }.distinct
    (dataPaths, manifests.map(_.path))
  }

  // ------------------------------------------------------------ orphans

  /** Delete files under the table location not referenced by any snapshot
    * (ref: actual-files LEFT ANTI valid-files on normalized path). */
  def removeOrphanFiles(table: IceTable, olderThanMillis: Long): Seq[String] = {
    val spark = table.spark
    import spark.implicits._
    val m = table.meta
    val actual = table.io.listRecursive(s"${table.location}/data")
      .filter(_.getModificationTime < olderThanMillis)
      .map(s => table.normPath(s.getPath.toString))
    if (actual.isEmpty) return Nil
    val (dataPaths, _) = reachableFiles(table, m, m.snapshots)
    val valid = dataPaths.map(table.normPath)
    val orphans = actual.toDF("path")
      .join(valid.toDF("path"), Seq("path"), "left_anti")
      .as[String].collect().toSeq
    orphans.foreach(table.io.delete)
    orphans
  }

  // ------------------------------------------------------------ compaction

  /** Bin-pack compaction (ref `BinPackStrategy.java:134`): group undersized
    * live files per partition up to the target size, rewrite each group, and
    * swap atomically. Returns (#files rewritten, #files added). */
  def rewriteDataFiles(table: IceTable,
      targetSizeBytes: Long = TableProperties.TargetFileSizeDefault,
      minInputFiles: Int = 2): (Int, Int) = {
    val m = table.meta
    val snap = m.currentSnapshot.getOrElse(return (0, 0))
    val entries = table.liveEntries(m, snap)
      .filter(_.dataFile.content == FileContent.Data)
    val groups = entries.groupBy(e => (e.dataFile.specId, e.dataFile.partition))
      .values.map(_.map(_.dataFile).filter(_.fileSizeBytes < targetSizeBytes))
      .filter(fs => fs.size >= minInputFiles)
      .toSeq
    if (groups.isEmpty) return (0, 0)
    val spark = table.spark
    val toRewrite = groups.flatten
    val df = Reads.readTasksWithDeletes(table, m,
      toRewrite.map(f => FileScanTask(f, graft.meta.expr.TrueExpr)),
      table.newScan().planDeletes(), m.schema.columnNames,
      graft.meta.expr.TrueExpr, rowPositions = false)
    // repartition to the target file count to actually bin-pack
    val totalBytes = toRewrite.map(_.fileSizeBytes).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetSizeBytes).toInt)
    val packed = if (m.spec.isPartitioned) df else df.repartition(nOut)
    val written = Writes.writeDataFiles(spark, table, m, packed)
      .filter(_.recordCount > 0)
    table.commitSnapshot(Operation.Replace, written,
      toRewrite.map(_.path).toSet, Map("compaction" -> "bin-pack"))
    (toRewrite.size, written.size)
  }

  /** Rewrite all live manifests into one per partition spec, clustering
    * entries (ref `BaseRewriteManifestsSparkAction`). */
  def rewriteManifests(table: IceTable): Int = {
    val m = table.meta
    val snap = m.currentSnapshot.getOrElse(return 0)
    table.ops.commitWithRetry(4) { base =>
      val cur = base.currentSnapshot.get
      val entries = table.liveEntries(base, cur)
      val nowMs = System.currentTimeMillis()
      val snapId = table.newSnapshotId()
      val seq = base.lastSequenceNumber + 1
      val mdir = s"${table.location}/metadata"
      val bySpec = entries.groupBy(_.dataFile.specId)
      val manifests = bySpec.toSeq.sortBy(_._1).map { case (specId, es) =>
        val spec = base.specById(specId)
        val sorted = es.sortBy(_.dataFile.partition.map(String.valueOf).mkString("/"))
          .map(_.copy(status = EntryStatus.Existing))
        ManifestIO.write(table.io, s"$mdir/manifest-${UUID.randomUUID()}.jsonl",
          sorted, base.schema, spec)
      }
      val listPath = s"$mdir/snap-$snapId.manifestlist.json"
      table.io.writeString(listPath,
        JsonCodecs.manifestListToJson(manifests, base.schema, base.specById))
      base.withSnapshot(SnapshotMeta(snapId, base.currentSnapshotId, seq, nowMs,
        Operation.Replace, Map("rewritten-manifests" -> manifests.size.toString),
        listPath), nowMs)
    }
    table.meta.currentSnapshot.map(s =>
      table.readManifestList(table.meta, s).size).getOrElse(0)
  }
}
