package graft.table

import java.util.UUID

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr._
import graft.meta.model._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{broadcast, coalesce, col}
import org.apache.spark.sql.types.StructType

/** One planned file: the data file plus the filter residual left after
  * partition pruning (ref `FileScanTask`), and the commit sequence number
  * (decides which delete files apply). */
final case class FileScanTask(file: DataFileMeta, residual: Expr, seq: Long = 0L)

/** Commit-time conflict validation for row-level operations (ref
  * `IsolationLevel.java` + `BaseOverwriteFiles.java:98`): the operation read
  * `startSnapshotId`; at commit, snapshots committed after it are checked for
  * files matching `conflictFilter` when `isolation` is serializable. */
final case class ConflictValidation(startSnapshotId: Option[Long],
    conflictFilter: Expr, isolation: String,
    /** Data files that must still be LIVE at commit time — the files a
      * merge-on-read operation's position deletes reference. A concurrent
      * rewrite of one of them would orphan the delete rows (a lost
      * update), so this is validated under EVERY isolation level (the CoW
      * paths are structurally protected by their removedPaths check). */
    requiredLivePaths: Set[String] = Set.empty)

/** A graft table: immutable parquet data files + snapshot-tree JSON metadata,
  * executed by Spark (SURVEY §1.4 rebuild mapping). All reads/writes are
  * DataFrame programs; only planning/commit is driver-side Scala, and the
  * driver never touches row data.
  */
final class IceTable private (val spark: SparkSession, val ops: TableOps)
    extends Lifecycle {

  def location: String = ops.location
  def meta: TableMetadata = {
    val m = ops.current()._2
    // latch forgery protection: once the table declares encryption
    // required, every later metadata read through this IO refuses
    // plaintext substitutes (FileIO.requireSealedMetadata)
    if (!io.requireSealedMetadata &&
        io.encryption != PlaintextEncryptionManager &&
        m.property(TableProperties.EncryptionRequired, "false").toBoolean)
      io.requireSealedMetadata = true
    m
  }
  def schema: Schema = meta.schema
  def spec: PartitionSpec = meta.spec
  def io: FileIO = ops.io

  /** One-shot flag for the fully-keyed-but-unstamped advisory (scan plan
    * logs it once per handle, never per query). */
  @volatile private[table] var advisedEncryptionRequired: Boolean = false

  private def retries(m: TableMetadata): Int =
    m.property(TableProperties.CommitRetries, TableProperties.CommitRetriesDefault.toString).toInt

  // ---------------------------------------------------------------- scan

  def newScan(): TableScan = new TableScan(this)

  /** Current-snapshot DataFrame (all columns). */
  def toDF: DataFrame = newScan().toDF

  /** Register the current snapshot as a temp view so `spark.sql` can query
    * it WITHOUT a catalog. The view pins an UNPRUNED materialized plan:
    * filters in later SQL do not reach the metadata cascade, and commits
    * after registration are invisible until re-registered. Prefer
    * `graft.spark.GraftCatalog` (`spark.sql.catalog.<name>` config), whose
    * relations prune per query and always read the current snapshot. */
  def registerView(name: String): Unit = toDF.createOrReplaceTempView(name)

  // ---------------------------------------------------------------- write

  /** Append `df` as a new snapshot. */
  def append(df: DataFrame): Unit = append(df, Map.empty)

  def append(df: DataFrame, summary: Map[String, String],
      writeOverrides: Map[String, String] = Map.empty): Unit = {
    val m = meta
    val files = Writes.writeDataFiles(spark, this, m, df, writeOverrides)
    commitSnapshot(Operation.Append, files, Set.empty, summary)
  }

  /** Write-audit-publish: stage an append as a snapshot WITHOUT making it
    * current (ref `SnapshotManager` wap :83-85). Returns the staged snapshot
    * id; audit it via `newScan().useSnapshot(id)`, publish via
    * `cherrypick(id)`. */
  def stageAppend(df: DataFrame, wapId: String,
      summary: Map[String, String] = Map.empty,
      writeOverrides: Map[String, String] = Map.empty): Long = {
    val m = meta
    val files = Writes.writeDataFiles(spark, this, m, df, writeOverrides)
    var staged = 0L
    ops.commitWithRetry(retries(m)) { base =>
      val nowMs = System.currentTimeMillis()
      val snapId = newSnapshotId()
      staged = snapId
      val seq = base.lastSequenceNumber + 1
      val mdir = s"$location/metadata"
      val entries = files.map(f => ManifestEntry(EntryStatus.Added, snapId, seq, f))
      val manifest = ManifestIO.write(io,
        ManifestIO.newPath(mdir, base, io), entries, base.schema, base.spec)
      val current = base.currentSnapshot.map(readManifestList(base, _)).getOrElse(Nil)
      val listPath = s"$mdir/snap-$snapId.manifestlist.json"
      io.writeString(listPath,
        JsonCodecs.manifestListToJson(manifest +: current, base.schema, base.specById))
      // snapshot recorded but NOT made current; no snapshot-log entry
      base.copy(
        lastSequenceNumber = seq,
        lastUpdatedMillis = nowMs,
        snapshots = base.snapshots :+ SnapshotMeta(snapId, base.currentSnapshotId,
          seq, nowMs, Operation.Append,
          summary ++ Map("wap.id" -> wapId,
            "added-data-files" -> files.size.toString), listPath))
    }
    staged
  }

  // ---------------------------------------------------------- maintenance

  /** Metadata table by name: snapshots, history, manifests, entries, files,
    * partitions, all_* (ref `MetadataTableType.java`). */
  def metadataTable(name: String): DataFrame = MetadataTables(this, name)

  def expireSnapshots(olderThanMillis: Long, retainLast: Int = 1): (Int, Long, Long) =
    Maintenance.expireSnapshots(this, olderThanMillis, retainLast)
  def removeOrphanFiles(olderThanMillis: Long = System.currentTimeMillis() - 3 * 24 * 3600 * 1000L): Seq[String] =
    Maintenance.removeOrphanFiles(this, olderThanMillis)
  def rewriteDataFiles(targetSizeBytes: Long = TableProperties.TargetFileSizeDefault,
      minInputFiles: Int = 2, minFileSizeBytes: Long = -1,
      maxFileSizeBytes: Long = -1,
      filter: graft.meta.expr.Expr = graft.meta.expr.TrueExpr,
      partialProgressCommits: Int = 1): (Int, Int) =
    Maintenance.rewriteDataFiles(this, targetSizeBytes, minInputFiles,
      minFileSizeBytes, maxFileSizeBytes, filter, partialProgressCommits)
  def rewriteDataFilesSorted(targetSizeBytes: Long = TableProperties.TargetFileSizeDefault,
      sortOrderSpec: Option[String] = None): (Int, Int) =
    Maintenance.rewriteDataFilesSorted(this, targetSizeBytes, sortOrderSpec)
  def rewriteDataFilesZOrder(zCols: Seq[String],
      targetSizeBytes: Long = TableProperties.TargetFileSizeDefault): (Int, Int) =
    Maintenance.rewriteDataFilesZOrder(this, zCols, targetSizeBytes)
  def rewriteManifests(): Int = Maintenance.rewriteManifests(this)

  def rewritePositionDeleteFiles(): (Int, Int) =
    Maintenance.rewritePositionDeleteFiles(this)

  def removeDanglingDeletes(): Int = Maintenance.removeDanglingDeletes(this)

  def convertEqualityDeletes(): (Int, Int) =
    Maintenance.convertEqualityDeletes(this)

  def maintain(): Maintenance.MaintainReport = Maintenance.maintain(this)

  /** Master-key rotation — requires this handle to carry a
    * [[KeyRotationManager]] (see its scaladoc for the protocol). */
  def rotateEncryptionKeys(
      targetSizeBytes: Long = TableProperties.TargetFileSizeDefault,
      partialProgressCommits: Int = 10): (Int, Int) =
    Maintenance.rotateEncryptionKeys(this, targetSizeBytes, partialProgressCommits)

  /** ANALYZE: one-pass column NDV/null profile of the current snapshot,
    * persisted for the CBO ([[TableStats]]). */
  def computeStats(columns: Seq[String] = Nil): graft.meta.model.StatsFileMeta =
    TableStats.compute(this, columns)
  def deleteReachableFiles(): (Long, Long) = Maintenance.deleteReachableFiles(this)

  /** Overwrite rows matching `filter` with `df` (copy-on-write; ref
    * `BaseOverwriteFiles`): whole files strictly matched are dropped, files
    * partially matched are rewritten without the matching rows. */
  def overwrite(filter: Expr, df: DataFrame): Unit =
    RowOps.overwrite(this, filter, Option(df))
  def overwrite(filter: Expr, df: DataFrame,
      extraSummary: Map[String, String]): Unit =
    RowOps.overwrite(this, filter, Option(df), extraSummary = extraSummary)

  private def rowLevelMode(key: String): String =
    meta.property(key, TableProperties.RowLevelCopyOnWrite)

  /** DELETE WHERE: metadata-only when file pruning can prove whole files
    * match; otherwise per `write.delete.mode` — copy-on-write rewrite
    * (default) or merge-on-read position-delete files (ref
    * `SparkTable.canDeleteWhere`, TableProperties DELETE_MODE). */
  def delete(filter: Expr): Unit =
    if (rowLevelMode(TableProperties.DeleteMode) == TableProperties.RowLevelMergeOnRead)
      MergeOnRead.deleteWhere(this, filter)
    else RowOps.overwrite(this, filter, None)

  /** Dynamic partition overwrite: replace every partition touched by `df`
    * (ref `BaseReplacePartitions`). */
  def overwritePartitions(df: DataFrame): Unit = RowOps.overwritePartitions(this, df)

  /** UPDATE SET: per `write.update.mode` — rewrite affected files with
    * assignments applied where `filter` holds (copy-on-write, default; ref
    * `RewriteUpdate.scala`), or position-delete the matching rows and append
    * their updated copies in one snapshot (merge-on-read). */
  def update(filter: Expr, assignments: Map[String, Column]): Unit =
    if (rowLevelMode(TableProperties.UpdateMode) == TableProperties.RowLevelMergeOnRead)
      MergeOnRead.updateWhere(this, filter, assignments)
    else RowOps.update(this, filter, assignments)

  /** MERGE INTO builder, equi-joined on `keys` (ref `RewriteMergeInto.scala`). */
  def merge(source: DataFrame, keys: Seq[String]): MergeBuilder =
    new MergeBuilder(this, source, keys)

  /** MERGE INTO with an arbitrary ON condition (ref `RewriteMergeInto.scala:162`):
    * reference target columns by name, source columns as `_s_<name>`. Also the
    * only mode supporting WHEN NOT MATCHED BY SOURCE clauses. */
  def mergeOn(source: DataFrame, cond: Column): MergeBuilder =
    new MergeBuilder(this, source, Nil, onCond = Some(cond))

  /** DELETE WHERE with a condition the predicate ADT can't express: `prune`
    * is a weaker pruning bound, `rowCond` the exact condition. */
  private[graft] def deleteRows(prune: Expr, rowCond: Column): Unit =
    if (rowLevelMode(TableProperties.DeleteMode) == TableProperties.RowLevelMergeOnRead)
      MergeOnRead.deleteWhere(this, prune, rowCond = Some(rowCond))
    else RowOps.overwrite(this, prune, None, rowCond = Some(rowCond))

  /** UPDATE with a non-convertible condition (see [[deleteRows]]). */
  private[graft] def updateRows(prune: Expr, assignments: Map[String, Column],
      rowCond: Column): Unit =
    if (rowLevelMode(TableProperties.UpdateMode) == TableProperties.RowLevelMergeOnRead)
      MergeOnRead.updateWhere(this, prune, assignments, rowCond = Some(rowCond))
    else RowOps.update(this, prune, assignments, rowCond = Some(rowCond))

  // ------------------------------------------------------- merge-on-read

  /** Row-delta commit of equality-delete keys: rows whose `keys` match any
    * row of `keysDf` disappear from reads, no data rewrite (format v2
    * merge-on-read; ref `EqualityDeleteWriter`). */
  /** Equality deletes keyed by the schema's identifier fields
    * (`SET IDENTIFIER FIELDS`). */
  def addEqualityDeletes(keysDf: DataFrame): Unit = {
    val keys = schema.identifierFieldNames
    require(keys.nonEmpty,
      "No identifier fields set (ALTER TABLE ... SET IDENTIFIER FIELDS, or pass keys)")
    addEqualityDeletes(keysDf, keys)
  }

  def addEqualityDeletes(keysDf: DataFrame, keys: Seq[String]): Unit =
    MergeOnRead.addEqualityDeletes(this, keysDf, keys)

  /** Row-delta commit of (file_path, pos) position deletes. */
  def addPositionDeletes(posDf: DataFrame): Unit =
    MergeOnRead.addPositionDeletes(this, posDf)

  /** Merge-on-read DELETE WHERE: one job records matching row positions as a
    * position-delete file — O(matched rows), no file rewrite. */
  def deleteMergeOnRead(filter: Expr): Unit = MergeOnRead.deleteWhere(this, filter)

  // ------------------------------------------------------------- snapshots

  def snapshots: Seq[SnapshotMeta] = meta.snapshots
  def currentSnapshot: Option[SnapshotMeta] = meta.currentSnapshot

  def rollbackTo(snapshotId: Long): Unit = setCurrentSnapshot(snapshotId)

  def setCurrentSnapshot(snapshotId: Long): Unit =
    ops.commitWithRetry(retries(meta)) { base =>
      require(base.snapshot(snapshotId).isDefined, s"Unknown snapshot: $snapshotId")
      val nowMs = System.currentTimeMillis()
      base.copy(currentSnapshotId = Some(snapshotId), lastUpdatedMillis = nowMs,
        snapshotLog = base.snapshotLog :+ SnapshotLogEntry(nowMs, snapshotId))
    }

  def rollbackToTime(timestampMillis: Long): Unit = {
    val snap = meta.snapshotAsOf(timestampMillis)
      .getOrElse(throw new ValidationException(s"No snapshot as of $timestampMillis"))
    setCurrentSnapshot(snap.snapshotId)
  }

  /** Re-apply the changes of `snapshotId` (an append) onto the current
    * state — the WAP publish path (ref `SnapshotManager.cherrypick:164`). */
  def cherrypick(snapshotId: Long): Unit = {
    val m = meta
    val snap = m.snapshot(snapshotId)
      .getOrElse(throw new ValidationException(s"Unknown snapshot: $snapshotId"))
    require(snap.operation == Operation.Append, "Can only cherry-pick appends")
    // WAP dedup (ref SnapshotManager: duplicate wap.id publish is an error)
    snap.summary.get("wap.id").foreach { wapId =>
      val ancestors = Iterator.iterate(m.currentSnapshot)(s =>
          s.flatMap(_.parentId).flatMap(m.snapshot))
        .takeWhile(_.isDefined).flatten
      if (ancestors.exists(_.summary.get("published-wap-id").contains(wapId)))
        throw new ValidationException(s"Duplicate cherry-pick of wap.id: $wapId")
    }
    val added = addedFiles(m, snap)
    commitSnapshot(Operation.Append, added, Set.empty,
      snap.summary.get("wap.id").map("published-wap-id" -> _).toMap)
  }

  // ------------------------------------------------------------------ refs

  /** Named snapshot refs (branches + tags); `main` is implicit. */
  def refs: Map[String, SnapshotRefMeta] = meta.refs

  /** Create a branch at `snapshotId` (default: current snapshot). Branch
    * commits (`appendToBranch`) advance the ref without touching main —
    * the write-audit-publish pattern generalized. */
  def createBranch(name: String, snapshotId: Option[Long] = None,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None): Unit =
    createRef(name, SnapshotRefMeta.Branch, snapshotId,
      minSnapshotsToKeep, maxSnapshotAgeMs, maxRefAgeMs)

  /** Create an immutable tag at `snapshotId` (default: current snapshot). */
  def createTag(name: String, snapshotId: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None): Unit =
    createRef(name, SnapshotRefMeta.Tag, snapshotId, None, None, maxRefAgeMs)

  private def createRef(name: String, refType: String, snapshotId: Option[Long],
      minKeep: Option[Int], maxSnapAge: Option[Long], maxRefAge: Option[Long]): Unit =
    ops.commitWithRetry(retries(meta)) { base =>
      if (name == SnapshotRefMeta.MainBranch || base.refs.contains(name))
        throw new ValidationException(s"Ref already exists: $name")
      val id = snapshotId.orElse(base.currentSnapshotId).getOrElse(
        throw new ValidationException("Table has no current snapshot to reference"))
      if (base.snapshot(id).isEmpty)
        throw new ValidationException(s"Unknown snapshot: $id")
      base.copy(
        refs = base.refs + (name -> SnapshotRefMeta(id, refType, minKeep,
          maxSnapAge, maxRefAge)),
        lastUpdatedMillis = System.currentTimeMillis())
    }

  def removeRef(name: String): Unit =
    ops.commitWithRetry(retries(meta)) { base =>
      if (!base.refs.contains(name))
        throw new ValidationException(s"Unknown ref: $name")
      base.copy(refs = base.refs - name,
        lastUpdatedMillis = System.currentTimeMillis())
    }

  /** Move a branch head to an arbitrary existing snapshot (rollback's
    * branch analogue; no ancestry requirement). */
  def replaceBranch(name: String, snapshotId: Long): Unit =
    ops.commitWithRetry(retries(meta)) { base =>
      val r = base.refs.getOrElse(name,
        throw new ValidationException(s"Unknown branch: $name"))
      if (r.refType != SnapshotRefMeta.Branch)
        throw new ValidationException(s"Not a branch: $name")
      if (base.snapshot(snapshotId).isEmpty)
        throw new ValidationException(s"Unknown snapshot: $snapshotId")
      base.copy(refs = base.refs.updated(name, r.copy(snapshotId = snapshotId)),
        lastUpdatedMillis = System.currentTimeMillis())
    }

  /** Fast-forward `name` (a branch, or `main`) to `toSnapshotId`, requiring
    * the target to be a DESCENDANT of the current head — the branch-publish
    * path: audit on a branch, then fast-forward main onto it. */
  def fastForward(name: String, toSnapshotId: Long): Unit =
    ops.commitWithRetry(retries(meta)) { base =>
      val headId: Option[Long] =
        if (name == SnapshotRefMeta.MainBranch) base.currentSnapshotId
        else {
          val r = base.refs.getOrElse(name,
            throw new ValidationException(s"Unknown branch: $name"))
          if (r.refType != SnapshotRefMeta.Branch)
            throw new ValidationException(s"Not a branch: $name")
          Some(r.snapshotId)
        }
      if (base.snapshot(toSnapshotId).isEmpty)
        throw new ValidationException(s"Unknown snapshot: $toSnapshotId")
      val ancestors = Iterator.iterate(base.snapshot(toSnapshotId))(
          _.flatMap(_.parentId).flatMap(base.snapshot))
        .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
      if (!headId.forall(ancestors.contains))
        throw new ValidationException(
          s"$toSnapshotId is not a descendant of $name's head $headId")
      val nowMs = System.currentTimeMillis()
      if (name == SnapshotRefMeta.MainBranch)
        base.copy(currentSnapshotId = Some(toSnapshotId), lastUpdatedMillis = nowMs,
          snapshotLog = base.snapshotLog :+ SnapshotLogEntry(nowMs, toSnapshotId))
      else
        base.copy(refs = base.refs.updated(name,
          base.refs(name).copy(snapshotId = toSnapshotId)),
          lastUpdatedMillis = nowMs)
    }

  /** Append `df` as a new snapshot on branch `name`; main is untouched. */
  def appendToBranch(name: String, df: DataFrame,
      summary: Map[String, String] = Map.empty): Unit = {
    val files = Writes.writeDataFiles(spark, this, meta, df)
    commitSnapshot(Operation.Append, files, Set.empty, summary,
      branch = Some(name))
  }

  // ---------------------------------------------------------- incremental

  /** Files appended in snapshot range (fromId, toId] (ref
    * `IncrementalDataTableScan.java:57`). Delete snapshots in the range are
    * skipped by default (the streaming CDC convention; ref
    * `SparkReadOptions.STREAMING_SKIP_DELETE_SNAPSHOTS`); with
    * `skipDeleteSnapshots = false` a delete/overwrite in range raises
    * instead, for consumers that cannot tolerate missed deletions. */
  def appendsBetween(fromId: Long, toId: Long,
      skipDeleteSnapshots: Boolean = true): DataFrame = {
    val m = meta
    val files = appendedFilesBetween(m, fromId, toId, skipDeleteSnapshots)
    Reads.readFiles(spark, this, m, files.map(FileScanTask(_, TrueExpr)),
      m.schema.columnNames, TrueExpr)
  }

  /** Row-level CDC changelog over the snapshot range (fromId, toId]: table
    * columns plus `_change_type`/`_commit_snapshot_id`/`_change_ordinal`.
    * `fromId = None` starts from the table's beginning; `toId = None` ends at
    * the current snapshot. See [[Changelog]] for semantics. */
  def changelog(fromId: Option[Long] = None, toId: Option[Long] = None,
      withRowIds: Boolean = false): DataFrame =
    Changelog.changes(this, fromId, toId, withRowIds)

  /** The data files appended in (fromId, toId] (planning half of
    * [[appendsBetween]]; also the micro-batch planner's input). */
  private[graft] def appendedFilesBetween(m: TableMetadata, fromId: Long,
      toId: Long, skipDeleteSnapshots: Boolean): Seq[DataFileMeta] = {
    val to = m.snapshot(toId).getOrElse(throw new ValidationException(s"Unknown: $toId"))
    // walk lineage to collect snapshots in range
    val lineage = Iterator.iterate(Option(to))(s =>
        s.flatMap(_.parentId).flatMap(m.snapshot))
      .takeWhile(s => s.isDefined && s.get.snapshotId != fromId)
      .flatten.toSeq
    require(lineage.lastOption.flatMap(_.parentId).contains(fromId) ||
      lineage.isEmpty, s"$fromId is not an ancestor of $toId")
    if (!skipDeleteSnapshots) {
      val destructive = lineage.filter(s =>
        s.operation == Operation.Delete || s.operation == Operation.Overwrite)
      if (destructive.nonEmpty) throw new ValidationException(
        s"Cannot stream appends over delete/overwrite snapshots: " +
          destructive.map(_.snapshotId).mkString(","))
    }
    lineage.filter(_.operation == Operation.Append)
      .flatMap(s => addedFiles(m, s))
      .filter(_.content == FileContent.Data)
  }

  /** Append snapshots in (fromId, toId], OLDEST first, with their
    * added-data-file counts — the admission-control planning input of the
    * micro-batch stream. Counts come from the snapshot summary counter when
    * present (no manifest IO), manifest reads otherwise. */
  private[graft] def appendSnapshotsBetween(m: TableMetadata, fromId: Long,
      toId: Long): Seq[(SnapshotMeta, Long)] = {
    val to = m.snapshot(toId).getOrElse(throw new ValidationException(s"Unknown: $toId"))
    val lineage = Iterator.iterate(Option(to))(s =>
        s.flatMap(_.parentId).flatMap(m.snapshot))
      .takeWhile(s => s.isDefined && s.get.snapshotId != fromId)
      .flatten.toSeq
    // same lineage validation as appendedFilesBetween: a checkpointed offset
    // that is no longer an ancestor (e.g. after a rollback) must fail, not
    // silently replay history from the root
    require(lineage.lastOption.flatMap(_.parentId).contains(fromId) ||
      lineage.isEmpty, s"$fromId is not an ancestor of $toId")
    lineage.reverse.filter(_.operation == Operation.Append).map { s =>
      val n = s.summary.get("added-data-files").flatMap(_.toLongOption)
        .getOrElse(addedFiles(m, s).size.toLong)
      (s, n)
    }
  }

  private def addedFiles(m: TableMetadata, snap: SnapshotMeta): Seq[DataFileMeta] = {
    val manifests = readManifestList(m, snap)
      .filter(_.addedSnapshotId == snap.snapshotId)
    ManifestIO.readAll(io, manifests, m.schema, m.specById)
      .flatMap(_._2)
      .filter(e => e.status == EntryStatus.Added && e.snapshotId == snap.snapshotId)
      .map(_.dataFile)
  }

  // ------------------------------------------------------------- internals

  /** Serializable-isolation conflict check (ref `BaseOverwriteFiles.java:98`
    * validateNoConflictingAppends + `IsolationLevel.java`): any file ADDED by
    * a snapshot committed after the operation started that MIGHT contain rows
    * matching the operation's conflict filter fails the commit. Under
    * snapshot isolation this check is skipped — only deletes of files the
    * operation rewrites conflict (the removal validation below). */
  private def validateNoConflicts(base: TableMetadata, v: ConflictValidation): Unit = {
    if (v.requiredLivePaths.nonEmpty) {
      val live: Set[String] = base.currentSnapshot.map(snap =>
        liveEntries(base, snap).map(e => normPath(e.dataFile.path)).toSet)
        .getOrElse(Set.empty)
      val gone = v.requiredLivePaths.map(normPath) -- live
      if (gone.nonEmpty) throw new ValidationException(
        s"Concurrent rewrite conflict: ${gone.size} file(s) referenced by " +
          s"this operation's position deletes are no longer live: " +
          gone.take(3).mkString(", "))
    }
    if (v.isolation != TableProperties.IsolationSerializable) return
    val bound = Binder.bind(base.schema, v.conflictFilter)
    val newSnaps = Iterator.iterate(base.currentSnapshot)(s =>
        s.flatMap(_.parentId).flatMap(base.snapshot))
      .takeWhile(s => s.isDefined && !v.startSnapshotId.contains(s.get.snapshotId))
      .flatten.toSeq
    val conflicting = newSnaps
      .filter(s => s.operation != Operation.Delete) // pure deletes add no rows
      .flatMap(s => addedFiles(base, s))
      .filter(f => fileMightMatch(base, bound, f))
    if (conflicting.nonEmpty) throw new ValidationException(
      s"Serializable isolation violation: ${conflicting.size} concurrently " +
        s"committed file(s) may contain rows matching the operation filter " +
        s"(snapshots ${newSnaps.map(_.snapshotId).mkString(",")})")
  }

  private def fileMightMatch(m: TableMetadata, bound: Expr, f: DataFileMeta): Boolean = {
    if (bound == TrueExpr) return true
    if (bound == FalseExpr) return false
    val spec = m.specById(f.specId)
    val partPred = Projections.inclusive(spec, m.schema, bound)
    val partLookup: Int => Any = { fid =>
      val i = spec.fields.indexWhere(_.fieldId == fid)
      if (i >= 0) f.partition(i) else null
    }
    RowEvaluator.eval(partPred, partLookup) &&
      InclusiveMetricsEvaluator.eval(bound, Reads.statsOf(f))
  }

  private[table] def readManifestList(m: TableMetadata,
      snap: SnapshotMeta): Seq[ManifestFileMeta] =
    JsonCodecs.manifestListFromJson(io.readString(snap.manifestList), m.schema, m.specById)

  private[table] def liveEntries(m: TableMetadata, snap: SnapshotMeta,
      manifestFilter: ManifestFileMeta => Boolean = _ => true): Seq[ManifestEntry] =
    ManifestIO.readAll(io, readManifestList(m, snap).filter(m0 =>
        m0.hasLiveFiles && manifestFilter(m0)), m.schema, m.specById)
      .flatMap(_._2).filter(_.status != EntryStatus.Deleted)

  private[table] def newSnapshotId(): Long =
    math.abs(UUID.randomUUID().getMostSignificantBits)

  private[table] def normPath(p: String): String = new Path(p).toUri.getPath

  /** Core commit: new snapshot = (current live files − removedPaths) ∪ added.
    * Carried manifests are kept untouched when they lose no files; touched
    * ones are compacted into a rewrite manifest (ref
    * `ManifestFilterManager.java:167`). Under concurrency, removal of a file
    * that no longer exists fails validation (serializable isolation for
    * overwrites; ref `BaseOverwriteFiles.java:98`).
    */
  /** Conservative manifest-level prune for removal commits (ref
    * `ManifestFilterManager.java:167` canContainDeletedFiles): a manifest
    * cannot contain a removed file unless their spec ids match AND the
    * file's partition tuple falls inside the manifest's partition-range
    * summaries. Any doubt (missing summaries, arity drift) keeps the
    * manifest as a candidate. */
  private def mayContainRemoved(base: TableMetadata, mf: ManifestFileMeta,
      removed: Seq[DataFileMeta]): Boolean = {
    val candidates = removed.filter(_.specId == mf.specId)
    if (candidates.isEmpty) return false
    val spec = base.specById(mf.specId)
    if (spec.fields.isEmpty ||
      mf.partitionSummaries.size != spec.fields.size) return true
    candidates.exists { f =>
      f.partition.size == spec.fields.size && spec.fields.indices.forall { i =>
        val s = mf.partitionSummaries(i)
        val v = f.partition(i)
        if (v == null) s.containsNull
        else {
          val t = spec.fieldType(base.schema, spec.fields(i))
          if (Literals.isNaN(v)) s.containsNan.getOrElse(true)
          else (s.lowerBound, s.upperBound) match {
            case (Some(lo), Some(hi)) =>
              Literals.compare(t, v, lo) >= 0 && Literals.compare(t, v, hi) <= 0
            case _ => false // only null/NaN values live in this manifest
          }
        }
      }
    }
  }

  /** Commit-time manifest auto-merge (ref `MergingSnapshotProducer.java`,
    * `ManifestMergeManager.java:79-120`): without it a table accreted by
    * thousands of appends carries thousands of tiny manifests and every
    * plan degrades linearly with commit count rather than data size. Per
    * spec, manifests are greedily packed from the OLD end of the list into
    * `commit.manifest.target-size-bytes` bins (lookback 1, so list order is
    * preserved); a multi-manifest bin is rewritten as one manifest — except
    * the bin holding this commit's fresh manifest, which only merges once
    * `commit.manifest.min-count-to-merge` manifests pile up, so recent
    * commits aren't rewritten on every append. Carried entries keep their
    * snapshot and sequence numbers; foreign `Added` entries become
    * `Existing` and the merged manifest is stamped with the committing
    * snapshot id, which keeps [[addedFiles]]' manifest-level
    * `addedSnapshotId` pruning and entry-level status filter exact (ref
    * `ManifestMergeManager.createManifest`). */
  private def mergeSmallManifests(base: TableMetadata,
      manifests: Seq[ManifestFileMeta], snapId: Long,
      mdir: String): Seq[ManifestFileMeta] = {
    if (manifests.size < 2) return manifests
    val targetSize = base.property(TableProperties.ManifestTargetSizeBytes,
      TableProperties.ManifestTargetSizeBytesDefault.toString).toLong
    val minCount = base.property(TableProperties.ManifestMinMergeCount,
      TableProperties.ManifestMinMergeCountDefault.toString).toInt
    // min-count protects the bin holding the head of the fresh-first list
    // (the just-written manifest when the commit added files; ref
    // `ManifestMergeManager.mergeManifests` takes `manifests.get(0)`) — so
    // pure-removal commits don't churn manifests on every commit either
    val firstPath = manifests.head.path
    manifests.groupBy(_.specId).toSeq.sortBy(_._1).flatMap { case (specId, group) =>
      // pack from the old end (the list is fresh-first) with lookback 1
      val bins = scala.collection.mutable.ArrayBuffer[List[ManifestFileMeta]]()
      var cur = List.empty[ManifestFileMeta]
      var curSize = 0L
      group.reverse.foreach { mf =>
        if (cur.nonEmpty && curSize + mf.length > targetSize) {
          bins += cur; cur = Nil; curSize = 0L
        }
        cur = mf :: cur // cons while walking old→new keeps each bin fresh-first
        curSize += mf.length
      }
      if (cur.nonEmpty) bins += cur
      bins.reverseIterator.flatMap { bin =>
        val merge = bin.size > 1 &&
          !(bin.exists(_.path == firstPath) && bin.size < minCount)
        if (!merge) bin
        else {
          val entries = ManifestIO.readAll(io, bin, base.schema, base.specById)
            .flatMap(_._2)
            .filter(_.status != EntryStatus.Deleted)
            .map(e =>
              if (e.status == EntryStatus.Added && e.snapshotId == snapId) e
              else e.copy(status = EntryStatus.Existing))
          if (entries.isEmpty) Nil
          else Seq(ManifestIO.write(io, ManifestIO.newPath(mdir, base, io), entries,
            base.schema, base.specById(specId), addedSnapshotId = Some(snapId)))
        }
      }
    }
  }

  /** @param removedMeta the full metadata of the removed files when the
    *                    caller has it: enables partition-summary pruning so
    *                    a removal commit opens only the manifests that can
    *                    contain the removed files (must cover every path in
    *                    `removedPaths`, else ignored). */
  private[graft] def commitSnapshot(op: String, added: Seq[DataFileMeta],
      removedPaths: Set[String], extraSummary: Map[String, String] = Map.empty,
      metaTransform: Option[TableMetadata => TableMetadata] = None,
      validate: Option[ConflictValidation] = None,
      removedMeta: Seq[DataFileMeta] = Nil,
      branch: Option[String] = None): Unit = {
    val removedNorm = removedPaths.map(normPath)
    val pruneMeta =
      if (removedMeta.nonEmpty &&
        removedNorm.subsetOf(removedMeta.map(f => normPath(f.path)).toSet))
        removedMeta
      else Nil
    ops.commitWithRetry(retries(meta)) { base0 =>
      val base = metaTransform.map(_(base0)).getOrElse(base0)
      validate.foreach(validateNoConflicts(base, _))
      val nowMs = System.currentTimeMillis()
      val snapId = newSnapshotId()
      val seq = base.lastSequenceNumber + 1
      val schema = base.schema
      val mdir = s"$location/metadata"
      // a branch commit builds on the BRANCH head, not the main head, and
      // advances only that ref at publish
      val headSnap: Option[SnapshotMeta] = branch match {
        case Some(b) =>
          val r = base.refs.getOrElse(b,
            throw new ValidationException(s"Unknown branch: $b"))
          if (r.refType != SnapshotRefMeta.Branch)
            throw new ValidationException(s"Cannot commit to tag: $b")
          base.snapshot(r.snapshotId)
        case None => base.currentSnapshot
      }
      val currentManifests: Seq[ManifestFileMeta] =
        headSnap.map(readManifestList(base, _)).getOrElse(Nil)

      var removedCount = 0 // all content types (validation + delta counters)
      // removal is validated by PATH: one deletion-vector sidecar path can
      // carry several blob entries, so the count check compares path sets
      val removedSeen = scala.collection.mutable.Set.empty[String]
      var removedBytes = 0L
      var removedDataCount = 0
      var removedDataRows = 0L
      var removedDeleteFiles = 0
      var removedDeleteBytes = 0L
      var removedPosDeletes = 0L
      var removedEqDeletes = 0L
      val keptManifests: Seq[ManifestFileMeta] =
        if (removedNorm.isEmpty) currentManifests
        else {
          // candidates only (summary-pruned when the caller gave metadata),
          // read on the manifest worker pool instead of serially
          val candidates =
            if (pruneMeta.isEmpty) currentManifests
            else currentManifests.filter(mayContainRemoved(base, _, pruneMeta))
          val readEntries: Map[String, Seq[ManifestEntry]] =
            ManifestIO.readAll(io, candidates, schema, base.specById)
              .map { case (mf, es) => mf.path -> es }.toMap
          currentManifests.flatMap { mf =>
            readEntries.get(mf.path) match {
              case None => Some(mf) // pruned: cannot contain a removed file
              case Some(entries0) =>
                val entries = entries0.filter(_.status != EntryStatus.Deleted)
                val (rm, keep) = entries.partition(e =>
                  removedNorm.contains(normPath(e.dataFile.path)))
                if (rm.isEmpty) Some(mf)
                else {
                  removedCount += rm.size
                  removedSeen ++= rm.map(e => normPath(e.dataFile.path))
                  // DV blobs share a sidecar: count each blob's own bytes,
                  // not the whole sidecar per entry
                  removedBytes += rm.map(e =>
                    e.dataFile.contentSize.getOrElse(e.dataFile.fileSizeBytes)).sum
                  rm.foreach { e =>
                    e.dataFile.content match {
                      case FileContent.Data =>
                        removedDataCount += 1
                        removedDataRows += e.dataFile.recordCount
                      case c if FileContent.isPositional(c) =>
                        removedDeleteFiles += 1
                        removedDeleteBytes += e.dataFile.contentSize
                          .getOrElse(e.dataFile.fileSizeBytes)
                        removedPosDeletes += e.dataFile.recordCount
                      case _ =>
                        removedDeleteFiles += 1
                        removedDeleteBytes += e.dataFile.fileSizeBytes
                        removedEqDeletes += e.dataFile.recordCount
                    }
                  }
                  if (keep.isEmpty) None
                  else {
                    val spec = base.specById(mf.specId)
                    val path = ManifestIO.newPath(mdir, base, io)
                    val kept = keep.map(e => e.copy(status = EntryStatus.Existing))
                    Some(ManifestIO.write(io, path, kept, schema, spec))
                  }
                }
            }
          }
        }
      if (removedNorm.nonEmpty && removedSeen != removedNorm)
        throw new ValidationException(
          s"Missing required files to delete: expected ${removedNorm.size} " +
            s"paths, found ${removedSeen.size} " +
            "(concurrent commit removed or rewrote them)")

      // row lineage: every added DATA file gets its implicit id span at
      // COMMIT time, carved from the base metadata's next-row-id —
      // re-derived per retry attempt, so concurrent committers always get
      // disjoint spans (the loser re-assigns from the winner's counter)
      var nextRid = base.nextRowId
      val added1 = added.map { f =>
        if (f.content != FileContent.Data || f.firstRowId.nonEmpty) f
        else {
          val a = f.copy(firstRowId = Some(nextRid))
          nextRid += math.max(0L, f.recordCount)
          a
        }
      }
      val addedManifest: Option[ManifestFileMeta] = if (added1.isEmpty) None else {
        val spec = base.spec
        val path = ManifestIO.newPath(mdir, base, io)
        val entries = added1.map(f => ManifestEntry(EntryStatus.Added, snapId, seq, f))
        Some(ManifestIO.write(io, path, entries, schema, spec))
      }

      val unmerged = addedManifest.toSeq ++ keptManifests
      val allManifests =
        if (base.property(TableProperties.ManifestMergeEnabled,
            TableProperties.ManifestMergeEnabledDefault).toBoolean)
          mergeSmallManifests(base, unmerged, snapId, mdir)
        else unmerged
      val listPath = s"$mdir/snap-$snapId.manifestlist.json"
      io.writeString(listPath, JsonCodecs.manifestListToJson(allManifests, schema, base.specById))

      // running totals (ref SnapshotSummary total-records/total-files-size):
      // carried forward from the head so writes can derive the table's
      // on-disk row width without reading any manifest. A pre-counter head
      // snapshot has no baseline — totals resume once history rolls over.
      // split by content like ref SnapshotSummary.java:256-264: record
      // counters are per-content (a MoR DELETE of N rows must NOT raise
      // total-records by N), file sizes cover every content type
      val addedBytes = added1.map(_.fileSizeBytes).sum
      val addedData = added1.filter(_.content == FileContent.Data)
      val addedRecords = addedData.map(_.recordCount).sum
      val addedDeleteFiles = added1.size - addedData.size
      val addedDeleteBytes = added1.filter(_.content != FileContent.Data)
        .map(f => f.contentSize.getOrElse(f.fileSizeBytes)).sum
      val addedPosDeletes = added1.filter(f => FileContent.isPositional(f.content))
        .map(_.recordCount).sum
      val addedEqDeletes = added1.filter(_.content == FileContent.EqualityDeletes)
        .map(_.recordCount).sum
      def carried(key: String, delta: Long): Option[(String, String)] = headSnap match {
        case None => Some(key -> delta.toString)
        case Some(h) => h.summary.get(key).flatMap(_.toLongOption)
          .map(prev => key -> (prev + delta).toString)
      }
      // per-partition change summaries (ref SnapshotSummary.java:49-51,
      // `write.summary.partition-limit`, default 0 = off): included only
      // when the commit touches few partitions — a 10k-partition overwrite
      // must not bloat every future metadata read with 10k summary entries
      val partLimit = base.property("write.summary.partition-limit", "0").toInt
      val partitionSummaries: Map[String, String] = {
        val byPart = addedData.filter(_.partition.nonEmpty).groupBy(_.partition)
        if (partLimit <= 0 || byPart.isEmpty || byPart.size > partLimit) Map.empty
        else byPart.map { case (tuple, fs) =>
          s"partitions.${tuple.mkString("/")}" ->
            s"added-data-files=${fs.size},added-records=${fs.map(_.recordCount).sum}"
        } + ("partition-summaries-included" -> "true") +
          ("changed-partition-count" -> byPart.size.toString)
      }
      // head predates the per-content counters: seed them from ONE walk of
      // the live entries (one-time cost per legacy table) instead of
      // assuming 0 — a 0 seed on a table that already holds MoR delete
      // files would undercount total-data-files and make the O(1)
      // delete-presence checks (e.g. IvfIndex.fetchByIds) trust a lie
      lazy val legacySeed: (Long, Long, Long, Long) = headSnap match {
        case None => (0L, 0L, 0L, 0L)
        case Some(_) =>
          val live = ManifestIO.readAll(io, currentManifests, schema, base.specById)
            .flatMap(_._2).filter(_.status != EntryStatus.Deleted)
            .map(_.dataFile).filter(_.content != FileContent.Data)
          (live.size.toLong,
            live.filter(f => FileContent.isPositional(f.content)).map(_.recordCount).sum,
            live.filter(_.content == FileContent.EqualityDeletes).map(_.recordCount).sum,
            live.map(f => f.contentSize.getOrElse(f.fileSizeBytes)).sum)
      }
      def carriedOrSeed(key: String, delta: Long, seed: => Long): (String, String) = {
        val base0 = headSnap.flatMap(_.summary.get(key)).flatMap(_.toLongOption)
          .getOrElse(seed)
        key -> math.max(0L, base0 + delta).toString
      }
      def ifPos(key: String, v: Long): Option[(String, String)] =
        if (v > 0) Some(key -> v.toString) else None
      val totalDeleteFiles =
        carriedOrSeed("total-delete-files", (addedDeleteFiles - removedDeleteFiles).toLong,
          legacySeed._1)
      // manifest live-entry counts include delete-file entries; subtract the
      // running delete-file total to keep total-data-files data-only
      val manifestLive = allManifests.map(f =>
        (f.addedFilesCount + f.existingFilesCount).toLong).sum
      val summary = Map(
        "added-data-files" -> addedData.size.toString,
        "added-records" -> addedRecords.toString,
        "added-files-size" -> addedBytes.toString,
        "deleted-data-files" -> removedDataCount.toString,
        "deleted-records" -> removedDataRows.toString,
        "removed-files-size" -> removedBytes.toString,
        "total-data-files" ->
          math.max(0L, manifestLive - totalDeleteFiles._2.toLong).toString) ++
        ifPos("added-delete-files", addedDeleteFiles.toLong) ++
        ifPos("removed-delete-files", removedDeleteFiles.toLong) ++
        ifPos("added-position-deletes", addedPosDeletes) ++
        ifPos("removed-position-deletes", removedPosDeletes) ++
        ifPos("added-equality-deletes", addedEqDeletes) ++
        ifPos("removed-equality-deletes", removedEqDeletes) ++
        Seq(totalDeleteFiles,
          carriedOrSeed("total-position-deletes",
            addedPosDeletes - removedPosDeletes, legacySeed._2),
          carriedOrSeed("total-equality-deletes",
            addedEqDeletes - removedEqDeletes, legacySeed._3),
          // delete-file BYTES, so the write-sizing row-width estimate can
          // subtract tombstone bytes from total-files-size
          carriedOrSeed("total-delete-files-size",
            addedDeleteBytes - removedDeleteBytes, legacySeed._4)) ++
        partitionSummaries ++
        carried("total-records", addedRecords - removedDataRows) ++
        carried("total-files-size", addedBytes - removedBytes) ++ extraSummary

      val snap = SnapshotMeta(snapId, headSnap.map(_.snapshotId), seq, nowMs,
        op, summary, listPath)
      (branch match {
        case Some(b) => base.copy(
          lastSequenceNumber = math.max(base.lastSequenceNumber, seq),
          lastUpdatedMillis = nowMs,
          snapshots = base.snapshots :+ snap,
          // snapshot-log stays main-lineage only (time travel by timestamp
          // resolves against main, like the published format spec)
          refs = base.refs.updated(b, base.refs(b).copy(snapshotId = snapId)))
        case None => base.withSnapshot(snap, nowMs)
      }).copy(nextRowId = nextRid)
    }
    val committed = branch match {
      case Some(b) => meta.refs.get(b).flatMap(r => meta.snapshot(r.snapshotId))
      case None => meta.currentSnapshot
    }
    committed.foreach { s =>
      Listeners.notifyAll(Listeners.CreateSnapshotEvent(
        location, s.operation, s.snapshotId, s.sequenceNumber, s.summary))
    }
  }
}

object IceTable {

  def create(spark: SparkSession, location: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrderMeta = SortOrderMeta.unsorted,
      properties: Map[String, String] = Map.empty): IceTable =
    createWith(spark,
      new TableOperations(location, new FileIO(spark.sparkContext.hadoopConfiguration)),
      schema, spec, sortOrder, properties)

  /** Create through caller-supplied [[TableOps]] (e.g. a JDBC-pointer
    * backend); the commit protocol is identical, only the pointer differs. */
  def createWith(spark: SparkSession, ops: TableOps, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrderMeta = SortOrderMeta.unsorted,
      properties: Map[String, String] = Map.empty): IceTable = {
    val location = ops.location
    require(!ops.exists, s"Table already exists: $location")
    // a table CREATED keyed records that encryption is required: a later
    // handle with the default plaintext FileIO (path loads, a sink missing
    // its encryption option) must refuse to APPEND — reads are already
    // guarded by per-file key metadata, but a pure append never plans
    // files, so without this property it would silently commit plaintext
    // into an encrypted table. (A table encrypted later sets the property
    // by hand — documented on TableProperties.EncryptionRequired.)
    val effectiveProps =
      if (ops.io.encryption == PlaintextEncryptionManager) properties
      else properties + (TableProperties.EncryptionRequired -> "true")
    val nowMs = System.currentTimeMillis()
    val m = TableMetadata(
      formatVersion = 2,
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMillis = nowMs,
      lastColumnId = schema.highestFieldId,
      currentSchemaId = schema.schemaId,
      schemas = Seq(schema),
      defaultSpecId = spec.specId,
      specs = Seq(spec),
      lastPartitionId = (999 +: spec.fields.map(_.fieldId)).max,
      defaultSortOrderId = sortOrder.orderId,
      sortOrders = Seq(sortOrder),
      properties = effectiveProps,
      currentSnapshotId = None,
      snapshots = Nil,
      snapshotLog = Nil,
      metadataLog = Nil)
    if (!ops.commit(0, m))
      throw new CommitFailedException(s"Concurrent create at $location")
    new IceTable(spark, ops)
  }

  def load(spark: SparkSession, location: String): IceTable =
    loadWith(spark,
      new TableOperations(location, new FileIO(spark.sparkContext.hadoopConfiguration)))

  def loadWith(spark: SparkSession, ops: TableOps): IceTable = {
    if (!ops.exists) throw new NoSuchTableException(s"No table at ${ops.location}")
    new IceTable(spark, ops)
  }

  def exists(spark: SparkSession, location: String): Boolean =
    new TableOperations(location,
      new FileIO(spark.sparkContext.hadoopConfiguration)).exists

  /** Rewrite every absolute path in a moved table's metadata tree to the new
    * location (manifest lists, manifests, snapshot pointers, metadata log).
    * Filesystem-catalog RENAME = directory move + this; the reference's
    * HadoopCatalog refuses rename because its Avro metadata stores absolute
    * paths too (`core/.../hadoop/HadoopCatalog.java` renameTable throws) —
    * here metadata is rewritable, so a rare O(metadata) pass keeps the table
    * self-consistent (chained renames stay safe). */
  def relocate(spark: SparkSession, newLocation: String,
      withIo: Option[FileIO] = None): Unit = {
    // encrypted tables relocate too: the caller's keyed FileIO reads and
    // REWRITES sealed manifests/lists (per-file keys derive from file
    // NAMES, which a directory move preserves — the ciphertext itself
    // needs no re-keying)
    val io = withIo.getOrElse(new FileIO(spark.sparkContext.hadoopConfiguration))
    val ops = new TableOperations(newLocation, io)
    val (version, base) = ops.current()
    val oldLoc = base.location
    if (oldLoc == newLocation) return
    // stored paths may carry a URI scheme (file:/…) while locations are
    // scheme-less — compare scheme-normalized forms
    def norm(p: String): String = new Path(p).toUri.getPath
    val oldNorm = norm(oldLoc)
    def remap(p: String): String = {
      val pn = norm(p)
      if (pn.startsWith(oldNorm)) newLocation + pn.substring(oldNorm.length) else p
    }
    // each manifest can appear in several manifest lists — rewrite once
    val newLengths = scala.collection.mutable.Map[String, Long]()
    base.snapshots.foreach { snap =>
      val listPath = remap(snap.manifestList)
      val manifests = JsonCodecs.manifestListFromJson(
        io.readString(listPath), base.schema, base.specById)
      val remapped = manifests.map { mf =>
        val mPath = remap(mf.path)
        val len = newLengths.getOrElseUpdate(mPath, {
          val entries = ManifestIO.read(io, mPath, base.schema, base.specById)
            .map(e => e.copy(dataFile = e.dataFile.copy(path = remap(e.dataFile.path))))
          ManifestIO.write(io, mPath, entries, base.schema,
            base.specById(mf.specId)).length
        })
        mf.copy(path = mPath, length = len)
      }
      io.writeString(listPath,
        JsonCodecs.manifestListToJson(remapped, base.schema, base.specById))
    }
    val newMeta = base.copy(
      location = newLocation,
      snapshots = base.snapshots.map(s => s.copy(manifestList = remap(s.manifestList))),
      metadataLog = base.metadataLog.map(e => e.copy(file = remap(e.file))),
      lastUpdatedMillis = System.currentTimeMillis())
    if (!ops.commit(version, newMeta))
      throw new CommitFailedException(s"Concurrent commit during relocate to $newLocation")
  }
}

/** Scan builder (ref `api/.../TableScan.java`): filter + projection +
  * snapshot selection, planned through the pruning cascade
  * manifest-summaries → partition values → file metrics → residual
  * (SURVEY §3.1). */
object TableScan {
  /** Metadata columns exposed by `withRowPositions()` (ref
    * `core/.../MetadataColumns.java` `_file`/`_pos`). */
  val MetaFileCol = "_gf_file"
  val MetaPosCol = "_gf_pos"
}

final class TableScan private[table] (table: IceTable) {
  private var filterExpr: Expr = TrueExpr
  private var projection: Option[Seq[String]] = None
  private var snapshotId: Option[Long] = None
  private var asOfMillis: Option[Long] = None
  private var rowPositions: Boolean = false
  private var scanOptions: Map[String, String] = Map.empty

  /** Expose `_gf_file`/`_gf_pos` metadata columns in the result. */
  def withRowPositions(): TableScan = { rowPositions = true; this }

  /** Per-scan options; `split-size` (bytes) overrides the
    * `read.split.target-size` table property for task sizing. */
  def option(key: String, value: String): TableScan = {
    scanOptions += (key -> value); this
  }

  def filter(e: Expr): TableScan = { filterExpr = And(filterExpr, e); this }

  private var sampleSpec: Option[(Double, Long)] = None

  /** FILE-level sampling at planning time: keep each planned data file
    * iff a seeded murmur3 of its path lands under `fraction` — the
    * ~fraction of the table is chosen before a single byte is read, so a
    * 1% sample of 100 TB costs ~1 TB of IO where row-level `.sample()`
    * scans everything and drops rows afterwards. Deterministic: the same
    * (file set, seed) always selects the same files — repeatable fits and
    * stats estimates; a different seed redraws. Approximate by nature
    * (file row counts vary, selection is per FILE) — the tool for
    * quantizer training, corpus statistics, and data exploration, not for
    * exact answers. Composes with filters (the pruning cascade runs
    * first) and with deletes (suppressed rows stay suppressed). */
  def sampleFiles(fraction: Double, seed: Long = 0L): TableScan = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"sample fraction $fraction out of (0, 1]")
    sampleSpec = Some((fraction, seed)); this
  }

  private def maybeSample(tasks: Seq[FileScanTask]): Seq[FileScanTask] =
    sampleSpec match {
      case None => tasks
      case Some((f, seed)) => tasks.filter { t =>
        val h = graft.meta.transforms.Murmur3.hashBytes(
          (t.file.path + "#" + seed).getBytes("UTF-8"))
        ((h & Int.MaxValue).toDouble / Int.MaxValue) < f
      }
    }

  private var appendsRange: Option[(Long, Long)] = None

  /** Incremental mode: plan only the data files APPENDED in (from, to]
    * (ref incremental table scans; delete snapshots are skipped, row-level
    * deletes do not apply — the result is each commit's appended rows as
    * written). The normal partition/metrics/residual pruning cascade still
    * applies on top. */
  def appendsBetween(fromId: Long, toId: Long): TableScan = {
    appendsRange = Some((fromId, toId)); this
  }
  def filter(sql: String): TableScan =
    filter(SparkFilterConv.convert(
      org.apache.spark.sql.graft.ColumnBridge.parseExpression(table.spark, sql)))
  def select(cols: String*): TableScan = { projection = Some(cols); this }
  def useSnapshot(id: Long): TableScan = { snapshotId = Some(id); this }

  /** Scan the head of a named ref (branch or tag); `main` is a no-op. */
  def useRef(name: String): TableScan =
    if (name == SnapshotRefMeta.MainBranch) this
    else useSnapshot(table.meta.refs.getOrElse(name,
      throw new ValidationException(s"Unknown ref: $name")).snapshotId)
  def asOfTime(timestampMillis: Long): TableScan = { asOfMillis = Some(timestampMillis); this }

  private def chooseSnapshot(m: TableMetadata): Option[SnapshotMeta] =
    snapshotId.map(id => m.snapshot(id).getOrElse(
        throw new ValidationException(s"Unknown snapshot: $id")))
      .orElse(asOfMillis.map(ts => m.snapshotAsOf(ts).getOrElse(
        throw new ValidationException(s"No snapshot as of $ts"))))
      .orElse(m.currentSnapshot)

  def planFiles(): Seq[FileScanTask] = {
    val m = table.meta
    val schema = m.schema
    chooseSnapshot(m) match {
      case None => Nil
      case Some(snap) =>
        val bound = Binder.bind(schema, filterExpr)
        if (bound == FalseExpr) return Nil
        // 1. manifest pruning by partition-range summaries
        val manifestOk: ManifestFileMeta => Boolean = { mf =>
          val spec = m.specById(mf.specId)
          ManifestEvaluator.eval(spec, schema, bound,
            mf.partitionSummaries.map(s => ManifestEvaluator.FieldSummary(
              s.containsNull, s.containsNan, s.lowerBound, s.upperBound)))
        }
        val entries = appendsRange match {
          case Some((from, to)) =>
            // incremental: candidate set = appended files of the range;
            // the same pruning cascade below still filters them
            table.appendedFilesBetween(m, from, to, skipDeleteSnapshots = true)
              .map(f => ManifestEntry(EntryStatus.Added, 0L, 0L, f))
          case None =>
            table.liveEntries(m, snap, manifestOk)
              .filter(_.dataFile.content == FileContent.Data)
        }
        // per-spec caches of the projected partition predicate + residuals
        val inclCache = scala.collection.mutable.Map[Int, Expr]()
        val residualCache = scala.collection.mutable.Map[(Int, Seq[Any]), Expr]()
        entries.iterator.flatMap { e =>
          val f = e.dataFile
          val spec = m.specById(f.specId)
          val partPred = inclCache.getOrElseUpdate(f.specId,
            Projections.inclusive(spec, schema, bound))
          val partLookup: Int => Any = { fid =>
            val i = spec.fields.indexWhere(_.fieldId == fid)
            if (i >= 0) f.partition(i) else null
          }
          // 2. partition-value pruning
          if (!RowEvaluator.eval(partPred, partLookup)) None
          // 3. file-metrics pruning
          else if (!InclusiveMetricsEvaluator.eval(bound, Reads.statsOf(f))) None
          else {
            // 4. residual for this partition
            val residual = residualCache.getOrElseUpdate((f.specId, f.partition),
              ResidualEvaluator.residual(spec, schema, bound, partLookup))
            if (residual == FalseExpr) None
            else Some(FileScanTask(f, residual, e.sequenceNumber))
          }
        }.toSeq match {
          case planned =>
            // encryption guard: a keyed file read (or compacted) through a
            // manager that can't decrypt it would surface as ciphertext or
            // garbage rows — fail at PLAN time, the one choke point every
            // reader (native scan, V1, maintenance, import) passes through
            if (table.io.encryption == PlaintextEncryptionManager)
              planned.find(_.file.keyMetadata.nonEmpty).foreach { t =>
                throw new ValidationException(
                  s"${t.file.path} carries encryption key metadata but the " +
                    "table's encryption manager is plaintext — configure the " +
                    "manager that wrote this file")
              }
            else {
              // a table that REQUIRES encryption must never plan a
              // plaintext file: km-empty entries are either impossible
              // leftovers (rotation stamps the property LAST) or forged
              // substitutes dropped next to the sealed files
              if (m.property(TableProperties.EncryptionRequired, "false").toBoolean)
                planned.find(_.file.keyMetadata.isEmpty).foreach { t =>
                  throw new ValidationException(
                    s"${t.file.path} carries no encryption key metadata but " +
                      "the table requires encrypted content " +
                      s"(${TableProperties.EncryptionRequired}=true) — " +
                      "refusing a possibly forged plaintext file")
                }
              // pre-r11 keyed tables: every live file keyed but the
              // property never stamped (it didn't exist yet) — those
              // tables get NONE of the forged-plaintext protections until
              // rotated or stamped. Advise once per handle; never
              // auto-stamp (a mixed table must keep reading its history).
              if (!m.property(TableProperties.EncryptionRequired, "false").toBoolean
                  && !table.advisedEncryptionRequired
                  && planned.nonEmpty
                  && planned.forall(_.file.keyMetadata.nonEmpty)) {
                table.advisedEncryptionRequired = true
                org.slf4j.LoggerFactory.getLogger(classOf[IceTable]).warn(
                  s"${table.location}: every scanned file is encrypted but " +
                    s"${TableProperties.EncryptionRequired} is not set — " +
                    "forged-plaintext protections are OFF; stamp the " +
                    "property (updateProperties) once fully keyed, or " +
                    "rotate keys (rotateEncryptionKeys stamps it last)")
              }
              // keyed manager: a keyed file whose metadata matches NONE of
              // this manager's derivations (a rotation handle accepts two)
              // was written under a DIFFERENT key — fail here, not as a
              // GCM tag error deep in a task
              planned.find(t => t.file.keyMetadata.nonEmpty &&
                  !table.io.encryption.accepts(t.file.path, t.file.keyMetadata))
                .foreach { t =>
                  throw new ValidationException(
                    s"${t.file.path} was encrypted under a different key " +
                      "than the table's current encryption manager derives " +
                      "— configure the manager that wrote this file")
                }
            }
            val out = maybeSample(planned)
            Listeners.notifyAll(Listeners.ScanEvent(
              table.location, snap.snapshotId, filterExpr.toString, out.size))
            out
        }
    }
  }

  /** Live delete files of the scanned snapshot with their sequence numbers. */
  def planDeletes(): Seq[(DataFileMeta, Long)] = planContent()._1

  /** One live-entries walk: (delete files with sequence numbers, the set of
    * live data-file formats). The scan builder needs both to pick the
    * merge-on-read read path without a second metadata pass. */
  def planContent(): (Seq[(DataFileMeta, Long)], Set[String]) = {
    // incremental mode reports appended rows AS WRITTEN: row-level deletes
    // never apply (and the planned entries carry sequence 0, which would
    // otherwise make EVERY live delete file look newer and strip rows)
    if (appendsRange.nonEmpty) return (Nil, Set.empty)
    val m = table.meta
    chooseSnapshot(m) match {
      case None => (Nil, Set.empty)
      case Some(snap) =>
        val entries = table.liveEntries(m, snap)
        val (del, data) = entries.partition(_.dataFile.content != FileContent.Data)
        // the same plan-time encryption guard data files get: a keyed
        // delete file under the wrong (or plaintext) manager must refuse
        // here, not as a KeyAccessDenied deep inside a delete-probe task
        if (table.io.encryption == PlaintextEncryptionManager)
          del.map(_.dataFile).find(_.keyMetadata.nonEmpty).foreach { f =>
            throw new ValidationException(
              s"${f.path} carries encryption key metadata but the table's " +
                "encryption manager is plaintext — configure the manager " +
                "that wrote this file")
          }
        else {
          if (m.property(TableProperties.EncryptionRequired, "false").toBoolean)
            del.map(_.dataFile).find(_.keyMetadata.isEmpty).foreach { f =>
              throw new ValidationException(
                s"${f.path} carries no encryption key metadata but the " +
                  "table requires encrypted content " +
                  s"(${TableProperties.EncryptionRequired}=true) — " +
                  "refusing a possibly forged plaintext delete file")
            }
          del.map(_.dataFile).find(f => f.keyMetadata.nonEmpty &&
              !table.io.encryption.accepts(f.path, f.keyMetadata))
            .foreach { f =>
              throw new ValidationException(
                s"${f.path} was encrypted under a different key than the " +
                  "table's current encryption manager derives — configure " +
                  "the manager that wrote this file")
            }
        }
        (del.map(e => (e.dataFile, e.sequenceNumber)), data.map(_.dataFile.format).toSet)
    }
  }

  def toDF: DataFrame = {
    val m = table.meta
    val cols = projection.getOrElse(m.schema.columnNames)
    // split planning: Spark packs files into tasks by maxPartitionBytes/
    // openCost (same bin-pack the ref runs in TableScanUtil.planTasks); a
    // target split size scopes those knobs to this scan via a cloned session
    val splitSize = scanOptions.get("split-size")
      .orElse(m.properties.get(TableProperties.SplitSize)).map(_.toLong)
    val session = splitSize.map { bytes =>
      require(bytes > 0, s"split-size must be positive: $bytes")
      val s = org.apache.spark.sql.graft.ColumnBridge.cloneSession(table.spark)
      s.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
      s.conf.set("spark.sql.files.openCostInBytes",
        math.min(bytes / 4, 4L * 1024 * 1024).toString)
      // without this Spark shrinks splits to totalBytes/parallelism,
      // overriding the requested size on small inputs
      s.conf.set("spark.sql.files.minPartitionNum", "1")
      s
    }
    Reads.readTasksWithDeletes(table, m, planFiles(), planDeletes(), cols,
      Binder.bind(m.schema, filterExpr), rowPositions, session)
  }
}

/** File-group reading with field-ID based schema resolution. */
private[graft] object Reads {

  def statsOf(f: DataFileMeta): MetricsSource = new MetricsSource {
    def rowCount: Long = f.recordCount
    def valueCount(id: Int): Option[Long] = f.valueCounts.get(id)
    def nullCount(id: Int): Option[Long] = f.nullCounts.get(id)
    def nanCount(id: Int): Option[Long] = f.nanCounts.get(id)
    def lower(id: Int): Option[Any] = f.lowerBounds.get(id)
    def upper(id: Int): Option[Any] = f.upperBounds.get(id)
  }

  /** Group scan tasks into APPLICABILITY CLASSES: two tasks share a branch
    * iff the exact same set of delete files applies to them (by sequence
    * rule AND partition scope — `MergeOnRead.applies`). Deletes partition
    * the data sequence numbers into at most #delete-commits+1 classes, so
    * the union stays bounded for long-lived tables regardless of how many
    * distinct data sequences exist (r1 verdict scale item #5); partition
    * scoping further drops whole delete files from branches they can't
    * touch. */
  /** Above this many branches, fall back to sequence-only grouping:
    * partition scope multiplies classes per (partition, seq-class), and a
    * many-partition table with scoped deletes would otherwise blow up the
    * union plan. Dropping the scope from GROUPING is semantically neutral —
    * scoped equality deletes key-cover the partition sources (out-of-scope
    * rows can't match) and position deletes match by exact file path — it
    * only costs some extra no-op anti-join probes. */
  private[graft] val MaxDeleteGroups = 64

  /** Above this many tasks a lineage read attaches per-file implicit lineage
    * via broadcast join instead of a literal-map lookup: `element_at` on a
    * constant map scans keys linearly per row, so the literal route is only
    * right when the rewrite set is small (the common compaction batch). */
  private[graft] val MaxLineageLiteralTasks = 64

  private[graft] def groupTasksByDeletes(tasks: Seq[FileScanTask],
      deletes: Seq[(DataFileMeta, Long)]): Seq[(Seq[DataFileMeta], Seq[FileScanTask])] = {
    def grouped(applies: ((DataFileMeta, Long), FileScanTask) => Boolean) =
      tasks.groupBy(t => deletes.collect { case e if applies(e, t) => e._1.path })
        .toSeq.sortBy(_._1.mkString(","))
        .map { case (paths, group) =>
          val pathSet = paths.toSet
          (deletes.map(_._1).filter(d => pathSet.contains(d.path)), group)
        }
    val scoped = grouped { case ((d, dseq), t) => MergeOnRead.applies(d, dseq, t) }
    if (scoped.size <= MaxDeleteGroups) scoped
    else grouped { case ((d, dseq), t) => MergeOnRead.seqApplies(d, dseq, t) }
  }

  /** Read tasks applying any merge-on-read delete files, one branch per
    * delete-applicability class. */
  def readTasksWithDeletes(table: IceTable, m: TableMetadata, tasks: Seq[FileScanTask],
      deletes: Seq[(DataFileMeta, Long)], projection: Seq[String], boundFilter: Expr,
      rowPositions: Boolean, session: Option[SparkSession] = None,
      /** Add `_gf_row_id`/`_gf_last_seq` output columns: each row's stable
        * lineage, composed from the files' materialized columns (written by
        * preserving rewrites) with the implicit per-file fallback
        * (commit-assigned first-row-id + position / the entry's sequence).
        * Null when the file predates id assignment. */
      withLineage: Boolean = false): DataFrame = {
    val spark = session.getOrElse(table.spark)
    // Native lineage route: every lineage read (rewrites, CoW/MoR merges,
    // changelog withRowIds) scans its EXPLICIT task set through the DSv2
    // batch readers, which emit _row_id/_last_updated_seq as per-slice
    // CONSTANTS — materialized columns win, else commit-assigned
    // first-row-id + position / the entry's sequence; the same semantics
    // as lineageize below, computed where both inputs are already known
    // instead of looked up per row above the scan (the r13 driver bench
    // had compaction +52% from that lookup). Split size and open cost
    // mirror Spark's own FilePartition.maxSplitBytes inputs from the
    // calling session, so the read-side bin-packing — which sizes a
    // rewrite's output files — matches the V1 scan this replaces.
    if (withLineage && boundFilter == TrueExpr && tasks.nonEmpty) {
      val bridge = org.apache.spark.sql.graft.ColumnBridge
      val (maxPart, openCost, minPart) = bridge.fileSplitConf(spark)
      val totalBytes = tasks.map(_.file.fileSizeBytes + openCost).sum
      val split = math.min(maxPart,
        math.max(openCost, totalBytes / math.max(1, minPart)))
      val projected = StructType(projection.map(n =>
        m.schema.struct(m.schema.struct.fieldIndex(n))))
      val outCols = projection.indices.toArray ++
        (if (rowPositions)
          Array(graft.spark.GraftBatchScan.OutFile,
            graft.spark.GraftBatchScan.OutPos)
        else Array.empty[Int]) ++
        Array(graft.spark.GraftBatchScan.OutRowId,
          graft.spark.GraftBatchScan.OutLastUpdated)
      val scan = new graft.spark.GraftBatchScan(table, TrueExpr, projected,
        Nil, snapshotId = None, asOfMillis = None,
        splitSize = Some(math.max(1L, split)), streamSkipDeletes = false,
        deletes = deletes, outCols = outCols,
        explicitTasks = Some(tasks), openCostOverride = Some(openCost))
      val frame = bridge.v2ScanFrame(spark,
        new graft.spark.GraftSparkTable(table, table.location), scan)
      val out = projection.map(col) ++
        (if (rowPositions)
          Seq(col(graft.spark.GraftSparkTable.FileCol).as(TableScan.MetaFileCol),
            col(graft.spark.GraftSparkTable.PosCol).as(TableScan.MetaPosCol))
        else Nil) ++
        Seq(col(graft.spark.GraftSparkTable.RowIdCol).as("_gf_row_id"),
          col(graft.spark.GraftSparkTable.LastUpdatedCol).as("_gf_last_seq"))
      return frame.select(out: _*)
    }
    def lineageize(df: DataFrame): DataFrame = {
      if (!withLineage) return df
      // Implicit lineage is a per-FILE constant lookup: path → (first-row-id,
      // seq). The broadcast join this replaces cost every rewrite read a
      // per-row regexp path normalization plus a codegen-breaking probe —
      // the driver's r13 bench had compaction +52% from it. Keys are
      // pre-expanded to every path convention the scan can report (V1
      // `_metadata.file_path` is "file:///p"; synthesized ORC/Avro frames
      // carry the stored path verbatim), so no per-row normalization is
      // needed on either route below.
      def keyed[T](value: FileScanTask => Option[T]): Seq[(String, T)] = {
        val seen = scala.collection.mutable.HashSet.empty[String]
        for {
          t <- tasks
          v <- value(t).toSeq
          n = table.normPath(t.file.path)
          k <- Seq(t.file.path, n, "file://" + n).distinct
          if seen.add(k)
        } yield k -> v
      }
      val firstPairs = keyed(_.file.firstRowId)
      val seqPairs = keyed(t => Some(t.seq))
      val file = df(TableScan.MetaFileCol)
      val out = if (tasks.size <= Reads.MaxLineageLiteralTasks) {
        // small rewrite sets: both lookups index a constant-folded literal
        // map — stays inside whole-stage codegen, no exchange at all
        def litMap(pairs: Seq[(String, Long)]): Column =
          org.apache.spark.sql.functions.map(pairs.flatMap { case (k, v) =>
            Seq(org.apache.spark.sql.functions.lit(k),
              org.apache.spark.sql.functions.lit(v)) }: _*)
        def look(pairs: Seq[(String, Long)]): Column =
          if (pairs.isEmpty) org.apache.spark.sql.functions.lit(null).cast("long")
          else org.apache.spark.sql.functions.element_at(litMap(pairs), file)
        df.withColumn("_gf_row_id", coalesce(col("_gf_mat_rid"),
            look(firstPairs) + col(TableScan.MetaPosCol)))
          .withColumn("_gf_last_seq",
            coalesce(col("_gf_mat_seq"), look(seqPairs)))
      } else {
        // large sets (literal-map lookups scan keys linearly per row):
        // broadcast hash join on the RAW reported path against the
        // pre-expanded keys — O(1) per row, still no per-row regexp
        val firstByKey = firstPairs.toMap
        val rows = seqPairs.map { case (k, s) => org.apache.spark.sql.Row(
          k, firstByKey.get(k).map(Long.box).orNull, Long.box(s)) }
        val lookup = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*),
          StructType(Seq(
            org.apache.spark.sql.types.StructField("_gf_lk_path",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("_gf_lk_first",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("_gf_lk_seq",
              org.apache.spark.sql.types.LongType))))
        df.join(broadcast(lookup), file === lookup("_gf_lk_path"), "left")
          .withColumn("_gf_row_id", coalesce(col("_gf_mat_rid"),
            col("_gf_lk_first") + col(TableScan.MetaPosCol)))
          .withColumn("_gf_last_seq",
            coalesce(col("_gf_mat_seq"), col("_gf_lk_seq")))
          .drop("_gf_lk_path", "_gf_lk_first", "_gf_lk_seq")
      }
      out.drop("_gf_mat_rid", "_gf_mat_seq")
    }
    val wantMeta = rowPositions || withLineage
    if (deletes.isEmpty || tasks.isEmpty) {
      val base = lineageize(readFiles(spark, table, m, tasks, projection,
        boundFilter, withMeta = wantMeta, withLineage = withLineage))
      return if (wantMeta && !rowPositions)
        base.drop(TableScan.MetaFileCol, TableScan.MetaPosCol)
      else base
    }
    val groups = groupTasksByDeletes(tasks, deletes)
    val needMeta = wantMeta || groups.exists(_._1.exists(d =>
      FileContent.isPositional(d.content)))
    val dfs = groups.map { case (applicable, group) =>
      // every branch carries the same columns so unionByName lines up
      val df = readFiles(spark, table, m, group, projection, boundFilter,
        withMeta = needMeta, withLineage = withLineage)
      MergeOnRead.applyDeletes(spark, m, df, applicable,
        groupPaths = group.map(t => table.normPath(t.file.path)),
        readOptions = EncryptionManagers.contentOptionsFor(
          table.io.encryption, "parquet",
          m.property(TableProperties.EncryptionRequired, "false").toBoolean),
        dvPositions = DeletionVectors.positionsDf(table, _))
    }
    val out = lineageize(dfs.reduce(_ unionByName _))
    if (needMeta && !rowPositions) out.drop(TableScan.MetaFileCol, TableScan.MetaPosCol)
    else out
  }

  def readFiles(spark: SparkSession, table: IceTable, m: TableMetadata,
      tasks: Seq[FileScanTask], projection: Seq[String], boundFilter: Expr,
      withMeta: Boolean = false,
      /** Also surface the files' MATERIALIZED lineage columns (written by
        * preserving rewrites) as `_gf_mat_rid`/`_gf_mat_seq` — null when a
        * file predates preservation or the format cannot express them
        * (synthesized-position groups). Callers coalesce with the implicit
        * per-file values; see [[readTasksWithDeletes]]. */
      withLineage: Boolean = false): DataFrame = {
    val schema = m.schema
    val projected0 = StructType(projection.map(n => schema.struct(schema.struct.fieldIndex(n))))
    val projected1 = if (!withMeta) projected0
      else projected0.add(TableScan.MetaFileCol, org.apache.spark.sql.types.StringType)
        .add(TableScan.MetaPosCol, org.apache.spark.sql.types.LongType)
    val projected = if (!withLineage) projected1
      else projected1.add("_gf_mat_rid", org.apache.spark.sql.types.LongType)
        .add("_gf_mat_seq", org.apache.spark.sql.types.LongType)
    if (tasks.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], projected)
    }
    val allResidualTrue = tasks.forall(_.residual == TrueExpr)
    // imported hive-layout tables: identity partition values are not in the
    // files — inject them as constants per partition group (ref
    // `PartitionUtil.constantsMap`)
    val inject = m.property(TableProperties.InjectPartitionConstants, "false").toBoolean
    // group by writer schema (resolve columns by field ID across renames),
    // plus the partition tuple when injecting constants
    val groups = tasks.groupBy(t =>
      (t.file.schemaId, t.file.format, if (inject) t.file.partition else Nil))
    val dfs = groups.toSeq.map { case ((schemaId, format, partValues), group) =>
      // parquet exposes real `_metadata.row_index`; ORC/Avro groups under
      // `withMeta` get SYNTHESIZED positions: whole-file per-file readers
      // with no pushed filters count row ordinals (ref DeleteFilter.java:111
      // applies position deletes format-agnostically in its row readers)
      val synthMeta = withMeta && format != "parquet"
      val writeSchema = m.schemas.find(_.schemaId == schemaId).getOrElse(schema)
      val spec0 = m.specById(group.head.file.specId)
      val constants: Map[Int, Any] = if (!inject) Map.empty
      else spec0.fields.zipWithIndex.collect {
        case (pf, i) if pf.transform == graft.meta.transforms.IdentityTransform =>
          pf.sourceId -> partValues.asInstanceOf[Seq[Any]](i)
      }.toMap
      // filter in the writer-schema name space (pushdown-friendly), then
      // map; predicates on injected-constant columns fold against the
      // constant first (files hold no values for them)
      val folded =
        if (constants.isEmpty) boundFilter
        else foldConstants(boundFilter, constants)
      val applyFilter = !allResidualTrue && folded != TrueExpr
      val readOpts = EncryptionManagers.contentOptionsFor(table.io.encryption,
        format, m.property(TableProperties.EncryptionRequired, "false").toBoolean)
      // ORC under the plaintext-refusal flag routes through the guarded
      // FileFormat (open-time tail probe) — Spark's own ORC reader has no
      // per-file decryption hook and would serve a forged plaintext file
      val fmtName =
        if (format == "orc" && readOpts.get(
            EncryptionManagers.PlaintextFilesAllowedKey).contains("false"))
          "org.apache.spark.sql.graft.GraftGuardedOrcFileFormat"
        else Writes.sparkFormat(format)
      val lineageReadable = withLineage && format == "parquet"
      val readSchema =
        if (!lineageReadable) writeSchema.struct
        else org.apache.spark.sql.types.StructType(writeSchema.struct.fields ++ Seq(
          org.apache.spark.sql.types.StructField(
            graft.spark.GraftReadPlanner.LineageRowIdCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(
            graft.spark.GraftReadPlanner.LineageSeqCol,
            org.apache.spark.sql.types.LongType)))
      val df =
        if (!synthMeta)
          spark.read.schema(readSchema)
            .options(readOpts)
            .format(fmtName).load(group.map(_.file.path): _*)
        else synthMetaFrame(spark, table, writeSchema, format, group,
          neededIds = (projection.map(schema.fieldId).filterNot(constants.contains) ++
            (if (applyFilter) referencedIds(renameToWriter(folded, writeSchema)) else Nil))
            .distinct)
      val mapped = projection.map { name =>
        val id = schema.fieldId(name)
        if (constants.contains(id)) {
          SparkConv.internalLit(constants(id), schema.fieldType(id)).as(name)
        } else writeSchema.idToName.get(id) match {
          case Some(oldName) =>
            // cast covers promoted types (int→long, float→double) in old files
            val cur = schema.fieldType(id)
            if (writeSchema.fieldType(id) == cur) col(oldName).as(name)
            else col(oldName).cast(cur).as(name)
          case None =>
            org.apache.spark.sql.functions.lit(null)
              .cast(schema.fieldType(id)).as(name)
        }
      }
      val filtered =
        if (!applyFilter) df
        else df.filter(SparkConv.toColumn(renameToWriter(folded, writeSchema), writeSchema))
      val withMetaCols =
        if (!withMeta) mapped
        else if (synthMeta) mapped ++ Seq(
          col(TableScan.MetaFileCol), col(TableScan.MetaPosCol))
        else mapped ++ Seq(
          col("_metadata.file_path").as(TableScan.MetaFileCol),
          col("_metadata.row_index").as(TableScan.MetaPosCol))
      val withLineageCols =
        if (!withLineage) withMetaCols
        else if (lineageReadable) withMetaCols ++ Seq(
          col(graft.spark.GraftReadPlanner.LineageRowIdCol).as("_gf_mat_rid"),
          col(graft.spark.GraftReadPlanner.LineageSeqCol).as("_gf_mat_seq"))
        else withMetaCols ++ Seq(
          org.apache.spark.sql.functions.lit(null).cast("long").as("_gf_mat_rid"),
          org.apache.spark.sql.functions.lit(null).cast("long").as("_gf_mat_seq"))
      filtered.select(withLineageCols: _*)
    }
    dfs.reduce(_ unionByName _)
  }

  /** A DataFrame over non-parquet files with synthesized `_gf_file`/`_gf_pos`
    * metadata columns: one whole-file reader per file (positions are the
    * in-order row ordinal; filters stay ABOVE the frame so no row is
    * skipped), distributed one file per task. `neededIds` prunes the read to
    * the referenced writer columns. */
  private def synthMetaFrame(spark: SparkSession, table: IceTable,
      writeSchema: Schema,
      format: String, group: Seq[FileScanTask], neededIds: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    import org.apache.spark.sql.catalyst.InternalRow
    val readerFields = neededIds.flatMap(id => writeSchema.idToName.get(id)
      .map(n => StructField(n, writeSchema.fieldType(id))))
    val readerSchema = StructType(readerFields)
    val reader = org.apache.spark.sql.graft.ColumnBridge.fileRowReader(
      spark, format, writeSchema.struct, readerSchema,
      EncryptionManagers.contentOptionsFor(table.io.encryption, format,
        table.meta.property(TableProperties.EncryptionRequired, "false").toBoolean))
    val files = group.map(t => (t.file.path, t.file.fileSizeBytes))
    val par = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism * 2))
    val rdd = spark.sparkContext.parallelize(files, par).mapPartitions { it =>
      it.flatMap { case (path, size) =>
        val meta = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
          Seq(StringType, LongType))
        meta.update(0, org.apache.spark.unsafe.types.UTF8String.fromString(path))
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        var pos = -1L
        reader(org.apache.spark.sql.graft.ColumnBridge.partitionedFile(path, size))
          .map { r =>
            pos += 1
            meta.setLong(1, pos)
            joined(r, meta): InternalRow
          }
      }
    }
    val synthSchema = StructType(readerFields :+
      StructField(TableScan.MetaFileCol, StringType) :+
      StructField(TableScan.MetaPosCol, LongType))
    org.apache.spark.sql.graft.ColumnBridge.internalCreateDataFrame(
      spark, rdd, synthSchema)
  }

  /** Field IDs a bound predicate references (after any renameToWriter the
    * remaining predicates all resolve in the writer schema). */
  private def referencedIds(e: Expr): Seq[Int] = e match {
    case And(l, r) => referencedIds(l) ++ referencedIds(r)
    case Or(l, r) => referencedIds(l) ++ referencedIds(r)
    case Not(c) => referencedIds(c)
    case p: BoundPred => Seq(p.fieldId)
    case _ => Nil
  }

  /** Partially evaluate a bound filter against per-file constant columns. */
  private def foldConstants(e: Expr, constants: Map[Int, Any]): Expr = e match {
    case And(l, r) => (foldConstants(l, constants), foldConstants(r, constants)) match {
      case (FalseExpr, _) | (_, FalseExpr) => FalseExpr
      case (TrueExpr, b) => b
      case (a, TrueExpr) => a
      case (a, b) => And(a, b)
    }
    case Or(l, r) => (foldConstants(l, constants), foldConstants(r, constants)) match {
      case (TrueExpr, _) | (_, TrueExpr) => TrueExpr
      case (FalseExpr, b) => b
      case (a, FalseExpr) => a
      case (a, b) => Or(a, b)
    }
    case Not(c) => foldConstants(c, constants) match {
      case TrueExpr => FalseExpr
      case FalseExpr => TrueExpr
      case b => Not(b)
    }
    case p: BoundPred if constants.contains(p.fieldId) =>
      if (RowEvaluator.eval(p, constants)) TrueExpr else FalseExpr
    case other => other
  }

  /** Rewrite bound predicate names to the writer schema's names (IDs fixed). */
  private def renameToWriter(e: Expr, writeSchema: Schema): Expr = e match {
    case And(l, r) => And(renameToWriter(l, writeSchema), renameToWriter(r, writeSchema))
    case Or(l, r) => Or(renameToWriter(l, writeSchema), renameToWriter(r, writeSchema))
    case Not(c) => Not(renameToWriter(c, writeSchema))
    case p: BoundPred => writeSchema.idToName.get(p.fieldId) match {
      case Some(n) => p.copy(name = n)
      case None => TrueExpr // column didn't exist yet: value is null ⇒ conservative keep
    }
    case other => other
  }
}

/** Data-file writing: hidden-partition routing via derived `_p_*` columns +
  * `partitionBy` (files keep every table column), distribution/ordering from
  * the table spec (ref `SparkPartitionedWriter`,
  * `DistributionAndOrderingUtils.scala:75`), metrics from parquet footers.
  */
private[table] object Writes {

  val HelperPrefix = "_p_"
  val DistributedMetricsThreshold = 64

  /** Table metadata keeps the public format name; Spark needs the registered
    * source for formats with no built-in module (`avro` → the graft
    * `FileFormat`, since the runtime has avro-core but not spark-avro). */
  def sparkFormat(format: String): String =
    if (format == "avro") "graft-avro" else format

  /** The [[TableProperties.EncryptionRequired]] gate, checked before EVERY
    * content write (data files here, delete files in [[MergeOnRead]]): a
    * plaintext-manager handle of a table that requires encryption must
    * refuse to write — per-file key metadata guards every read, but a pure
    * append plans no files, so this property is the only thing standing
    * between a misconfigured writer and plaintext rows in an encrypted
    * table. */
  private[table] def requireEncryptionSatisfied(table: IceTable,
      m: TableMetadata): Unit =
    if (m.property(TableProperties.EncryptionRequired, "false").toBoolean &&
        table.io.encryption == PlaintextEncryptionManager)
      throw new ValidationException(
        s"${table.location} requires encrypted writes " +
          s"(${TableProperties.EncryptionRequired}=true) but this handle's " +
          "encryption manager is plaintext — load the table with its keyed " +
          "manager (streaming: option(\"encryption\", ...))")

  private[table] def fileMetrics(conf: org.apache.hadoop.conf.Configuration,
      format: String, path: String, schema: Schema,
      enc: Option[EncryptionManager] = None): ParquetMetrics.FileMetrics =
    format match {
      case "orc" => OrcMetrics.read(
        EncryptionManagers.orcCryptoConf(conf, enc), path, schema)
      case "avro" => AvroMetrics.read(conf, path, schema, enc)
      case _ => ParquetMetrics.read(
        EncryptionManagers.parquetCryptoConf(conf, enc), path, schema)
    }

  /** `write.parquet.bloom-filter-*` table properties → parquet-mr writer
    * conf. `...bloom-filter-enabled.column.<c>` / `...-fpp.column.<c>` /
    * `...-expected-ndv.column.<c>` key single columns (nested fields by
    * their dotted parquet path); `write.parquet.bloom-filter-max-bytes`
    * caps the per-column filter size. Top-level names are validated
    * against the CURRENT schema — a typo'd column would otherwise
    * silently write no filter and every point lookup would quietly read
    * the whole table. '#' is parquet's column-spec delimiter and cannot
    * appear in a keyed name. */
  private[table] def parquetBloomOptions(m: TableMetadata,
      overrides: Map[String, String], schema: Schema): Map[String, String] = {
    val eff = m.properties ++ overrides
    def perColumn(prefix: String, parquetKey: String): Map[String, String] =
      eff.collect { case (k, v) if k.startsWith(prefix) =>
        val c = k.stripPrefix(prefix)
        if (c.isEmpty || c.contains("#"))
          throw new UnsupportedOperationException(
            s"invalid bloom filter column name '$c' in property '$k'")
        if (!c.contains(".") && !schema.columnNames.contains(c))
          throw new ValidationException(
            s"bloom filter property '$k' names no current column " +
              s"(have: ${schema.columnNames.mkString(", ")})")
        s"$parquetKey#$c" -> v
      }
    perColumn("write.parquet.bloom-filter-enabled.column.",
        "parquet.bloom.filter.enabled") ++
      perColumn("write.parquet.bloom-filter-fpp.column.",
        "parquet.bloom.filter.fpp") ++
      perColumn("write.parquet.bloom-filter-expected-ndv.column.",
        "parquet.bloom.filter.expected.ndv") ++
      (eff.get("write.parquet.bloom-filter-max-bytes") match {
        case Some(v) => Map("parquet.bloom.filter.max.bytes" -> v)
        case None => Map.empty[String, String]
      })
  }

  /** Should rewrites preserve row lineage on this table? Parquet-format
    * tables only (the default): other formats cannot reliably read the
    * materialized columns back on the NEXT rewrite, and silently wrong
    * ids are worse than fresh ones. */
  private[graft] def lineagePreserve(m: TableMetadata): Boolean =
    m.property(TableProperties.DefaultFileFormat, "parquet") == "parquet" &&
      m.property(TableProperties.RowLineagePreserve, "true").toBoolean

  def writeDataFiles(spark: SparkSession, table: IceTable, m: TableMetadata,
      df: DataFrame, overrides: Map[String, String] = Map.empty,
      /** Carry `df`'s `_gf_row_id`/`_gf_last_seq` columns into the written
        * files as MATERIALIZED lineage (preserving rewrites). Extra
        * physical columns are invisible to schema-projected reads; the
        * lineage read path coalesces them over the implicit values. */
      lineageCols: Boolean = false): Seq[DataFileMeta] = {
    val schema = m.schema
    val spec = m.spec
    // per-write option overrides (ref SparkWriteOptions) win over table props
    def prop(key: String, default: String): String =
      overrides.getOrElse(key, m.property(key, default))
    // align to table schema (names must match; types are cast)
    val aligned = df.select((schema.struct.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq ++
      (if (!lineageCols) Nil else Seq(
        col(graft.spark.GraftReadPlanner.LineageRowIdCol).cast("long"),
        col(graft.spark.GraftReadPlanner.LineageSeqCol).cast("long")))).toIndexedSeq: _*)
    val outDir = Locations.newWriteDir(table.location, m, UUID.randomUUID().toString)
    val format = prop(TableProperties.DefaultFileFormat, "parquet")
    Writes.requireEncryptionSatisfied(table, m)
    // real encryption on every format: avro through library-owned streams,
    // parquet through Parquet Modular Encryption, ORC through its
    // KeyProvider SPI (r11 — Spark's writer goes through
    // `org.apache.orc.mapred.OrcOutputFormat.buildOptions`, which reads
    // `orc.encrypt` from the per-write conf). Parquet and ORC both need a
    // key-exposing manager; a stream-only custom manager there would
    // silently write plaintext, so refuse up front
    if (table.io.encryption != PlaintextEncryptionManager && format != "avro" &&
        !table.io.encryption.isInstanceOf[KeyedFileEncryption])
      throw new UnsupportedOperationException(
        s"encryption manager ${table.io.encryption.getClass.getSimpleName} " +
          s"cannot encrypt '$format' data files — avro streams are " +
          "library-owned; parquet and ORC need a KeyedFileEncryption " +
          "manager (set write.format.default accordingly or use the " +
          "plaintext manager)")
    // Roll output files at ~write.target-file-size-bytes (ref rolling file
    // writers, `TableProperties.java:145`): Spark rolls by RECORD count, so
    // convert the byte target through the table's observed on-disk row width
    // (the snapshot summary's running total-files-size / total-records —
    // zero extra IO). A 1000-executor job writing one hot partition then
    // emits ~target-size files instead of one monolith. An empty table (or
    // pre-counter history) has no width estimate and keeps Spark's default
    // of one file per task.
    val maxRecords: Option[Long] = for {
      snap <- m.currentSnapshot
      allBytes <- snap.summary.get("total-files-size").flatMap(_.toLongOption)
      rows <- snap.summary.get("total-records").flatMap(_.toLongOption)
      // total-files-size covers every content type but total-records is
      // data-only — subtract tombstone bytes or a MoR-heavy table's width
      // estimate inflates and appends roll too-small files
      bytes = allBytes - snap.summary.get("total-delete-files-size")
        .flatMap(_.toLongOption).getOrElse(0L)
      if rows > 0 && bytes > 0
      targetBytes = prop(TableProperties.TargetFileSize,
        TableProperties.TargetFileSizeDefault.toString).toLong
    } yield math.max(1L, targetBytes / math.max(1L, bytes / rows))
    // file-format tuning (ref TableProperties.java:63-79): write options
    // reach the task-side writers through the per-write hadoop conf
    // (newHadoopConfWithOptions), so row-group/page sizing needs no session
    // mutation. Defaults keep Spark's snappy (the ref-era gzip default
    // predates zstd; snappy/zstd is what its own docs recommend for scans).
    val fileOptions: Map[String, String] = format match {
      case "parquet" =>
        val codec = prop("write.parquet.compression-codec", "snappy")
        val level = prop("write.parquet.compression-level", "")
        Map(
          "compression" -> codec,
          "parquet.block.size" -> prop("write.parquet.row-group-size-bytes",
            (128L << 20).toString),
          "parquet.page.size" -> prop("write.parquet.page-size-bytes",
            (1L << 20).toString),
          "parquet.dictionary.page.size" -> prop("write.parquet.dict-size-bytes",
            (2L << 20).toString)) ++
          (if (level.nonEmpty)
            Map(s"parquet.compression.codec.${codec.toLowerCase}.level" -> level)
          else Map.empty) ++
          // per-column bloom filters (post-reference-era Iceberg property
          // names; parquet-mr sizes from expected-ndv when set, else caps
          // at max-bytes). Point lookups then skip row groups whose stats
          // can't prune — the "needle id in 100 TB" scan shape. Read side
          // is free: pushed filters engage parquet-mr's bloom row-group
          // filter through the same FilterCompat path as stats/dictionary.
          parquetBloomOptions(m, overrides, schema) ++
          // keyed managers engage Parquet Modular Encryption in the task
          // writers through the per-write conf (factory + serialized manager)
          EncryptionManagers.parquetCryptoOptions(table.io.encryption)
      case "orc" =>
        Map("compression" -> prop("write.orc.compression-codec", "snappy")) ++
          // per-column bloom filters (later-Iceberg property names): ORC
          // stores them per row group in the row index, so a point lookup
          // whose SArg value misses the filter skips the row group even
          // when min/max can't prune — same shape as the parquet blooms
          (prop("write.orc.bloom.filter.columns", "") match {
            case "" => Map.empty[String, String]
            case cols =>
              val names = cols.split(",").map(_.trim).filter(_.nonEmpty)
              names.find(c => !schema.columnNames.contains(c)).foreach(c =>
                throw new ValidationException(
                  s"write.orc.bloom.filter.columns names no current " +
                    s"column '$c' (have: ${schema.columnNames.mkString(", ")})"))
              Map("orc.bloom.filter.columns" -> names.mkString(",")) ++
                (prop("write.orc.bloom.filter.fpp", "") match {
                  case "" => Map.empty[String, String]
                  case fpp => Map("orc.bloom.filter.fpp" -> fpp)
                })
          }) ++
          // keyed managers engage ORC columnar encryption in the task
          // writers: provider selection + manager on the conf, plus the
          // column spec (every top-level column under the graft key)
          (table.io.encryption match {
            case _: KeyedFileEncryption =>
              val cols = schema.columnNames ++
                (if (lineageCols) Seq(graft.spark.GraftReadPlanner.LineageRowIdCol,
                  graft.spark.GraftReadPlanner.LineageSeqCol) else Nil)
              // ',' ':' ';' delimit the spec; '.' means a NESTED path —
              // a dotted top-level name would silently key the wrong node
              cols.find(c => c.contains(",") || c.contains(":") ||
                  c.contains(";") || c.contains("."))
                .foreach(c => throw new UnsupportedOperationException(
                  s"ORC encryption cannot express column name '$c' in its " +
                    "orc.encrypt spec (contains a delimiter)"))
              EncryptionManagers.orcCryptoOptions(table.io.encryption) +
                ("orc.encrypt" -> s"graft:${cols.mkString(",")}")
            case _ => Map.empty[String, String]
          })
      case "avro" =>
        // avro names deflate what the ref property calls gzip
        Map("graft.avro.codec" ->
          (prop("write.avro.compression-codec", "snappy") match {
            case "gzip" => "deflate"
            case c => c
          })) ++
          // sync-marker interval = the split granularity of the container
          (prop("write.avro.sync-interval-bytes", "") match {
            case "" => Map.empty[String, String]
            case v => Map("graft.avro.sync.interval" -> v)
          }) ++
          // task-side writers re-hydrate the manager and wrap their streams
          (if (table.io.encryption == PlaintextEncryptionManager) Map.empty
          else Map(EncryptionManagers.OptionKey ->
            EncryptionManagers.serialize(table.io.encryption)))
      case _ => Map.empty
    }
    def withRolling(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) =
      maxRecords.fold(w)(n => w.option("maxRecordsPerFile", n)).options(fileOptions)
        // no _SUCCESS markers: manifests are the commit record, and the
        // zero-byte files would be unreachable orphans under purge
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")

    if (spec.isUnpartitioned) {
      withRolling(sorted(m, schema, aligned, Nil).write.format(sparkFormat(format)))
        .save(outDir)
    } else {
      val helperCols = spec.fields.map { pf =>
        val srcName = schema.fieldName(pf.sourceId)
        pf.transform.toColumn(col(srcName), schema.fieldType(pf.sourceId))
          .as(HelperPrefix + pf.name)
      }
      val helperNames = spec.fields.map(pf => HelperPrefix + pf.name)
      val withHelpers = aligned.withColumns(
        helperNames.zip(helperCols).toMap)
      val mode = prop(TableProperties.DistributionMode, "hash")
      val fanout = prop(TableProperties.FanoutEnabled, "false").toBoolean
      val distributed = mode match {
        case _ if fanout => withHelpers
        case "hash" => withHelpers.repartition(helperNames.map(col): _*)
        case "range" => withHelpers.repartitionByRange(
          (helperNames.map(col) ++ sortCols(m, schema)): _*)
        case _ => withHelpers
      }
      withRolling(sorted(m, schema, distributed, helperNames)
        .write.partitionBy(helperNames: _*).format(sparkFormat(format))).save(outDir)
    }
    collectDataFiles(spark, table, m, outDir, format)
  }

  private def sortCols(m: TableMetadata, schema: Schema): Seq[Column] =
    m.sortOrder.fields.map { sf =>
      val src = schema.fieldName(sf.sourceId)
      val t = graft.meta.transforms.Transform.parse(sf.transform)
      val c = t.toColumn(col(src), schema.fieldType(sf.sourceId))
      val dir = if (sf.ascending) c.asc else c.desc
      if (sf.nullsFirst) (if (sf.ascending) c.asc_nulls_first else c.desc_nulls_first)
      else (if (sf.ascending) c.asc_nulls_last else c.desc_nulls_last)
    }

  private def sorted(m: TableMetadata, schema: Schema, df: DataFrame,
      helperNames: Seq[String]): DataFrame = {
    val sc = sortCols(m, schema)
    if (sc.isEmpty) df
    else df.sortWithinPartitions((helperNames.map(col) ++ sc): _*)
  }

  /** List written files, parse partition values from hive-style paths, read
    * footers for metrics. */
  def collectDataFiles(spark: SparkSession, table: IceTable, m: TableMetadata,
      outDir: String, format: String = "parquet"): Seq[DataFileMeta] = {
    val schema = m.schema
    val spec = m.spec
    val modeOf = MetricsModes.forTable(m)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = table.io.listRecursive(outDir)
      .filter(s => s.getPath.getName.endsWith("." + format) ||
        s.getPath.getName.endsWith("." + format + ".snappy") ||
        s.getPath.getName.contains("." + format))
      .filter(s => !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    // footer metrics: small commits read on a driver pool; large commits as
    // a Spark job (executor-side, like the ref collects metrics in the
    // writers — the driver never becomes the bottleneck at scale)
    val enc = Some(table.io.encryption).filter(_ != PlaintextEncryptionManager)
    val metricsByPath: Map[String, ParquetMetrics.FileMetrics] = {
      val paths = files.map(_.getPath.toString)
      if (paths.size > DistributedMetricsThreshold) {
        val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
        val fmt = format
        val serEnc = enc // EncryptionManager is Serializable by contract
        val bcSchema = spark.sparkContext.broadcast(schema)
        spark.sparkContext.parallelize(paths, math.max(1, paths.size / 16))
          .map(p => p -> fileMetrics(serConf.value, fmt, p, bcSchema.value, serEnc))
          .collect().toMap
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ManifestIO.ioPool
        Await.result(Future.sequence(paths.map(p => Future {
          p -> fileMetrics(conf, format, p, schema, enc)
        })), Duration.Inf).toMap
      }
    }
    files.map { st =>
      val path = st.getPath.toString
      val rel = path.stripPrefix(outDir).stripPrefix("/")
      val partValues: Seq[Any] = if (spec.isUnpartitioned) Nil else {
        val dirs = rel.split('/').dropRight(1)
          .filter(_.contains('='))
          .map { seg =>
            val Array(k, v) = seg.split("=", 2)
            k.stripPrefix(HelperPrefix) -> ExternalCatalogUtils.unescapePathName(v)
          }.toMap
        spec.fields.map { pf =>
          val raw = dirs.getOrElse(pf.name,
            throw new IllegalStateException(s"No partition dir for ${pf.name} in $rel"))
          if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
          else parsePartitionValue(raw, spec.fieldType(schema, pf))
        }
      }
      val metrics = MetricsModes.apply(metricsByPath(path), schema, modeOf)
      DataFileMeta(
        path = path,
        format = format,
        specId = spec.specId,
        partition = partValues,
        recordCount = metrics.recordCount,
        fileSizeBytes = st.getLen,
        valueCounts = metrics.valueCounts,
        nullCounts = metrics.nullCounts,
        nanCounts = metrics.nanCounts,
        lowerBounds = metrics.lowerBounds,
        upperBounds = metrics.upperBounds,
        splitOffsets = metrics.splitOffsets,
        sortOrderId = m.defaultSortOrderId,
        schemaId = m.currentSchemaId,
        // the manifest's key slot — derived driver-side, identical to what
        // the write task derived (the keyMetadata purity contract)
        keyMetadata = table.io.encryption.keyMetadata(path))
    }
  }

  private[table] def parsePartitionValue(raw: String, t: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    t match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case StringType => raw
      case BooleanType => raw.toBoolean
      case FloatType => raw.toFloat
      case DoubleType => raw.toDouble
      case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case TimestampType | TimestampNTZType =>
        graft.meta.expr.Literals.convert(raw.replace(' ', 'T')
          .replaceAll("(?i)\\.0$", ""), t)
      case dt: DecimalType => new java.math.BigDecimal(raw).setScale(dt.scale)
      case other => throw new IllegalArgumentException(s"Cannot parse partition value: $other")
    }
  }
}
