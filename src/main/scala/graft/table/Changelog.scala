package graft.table

import graft.meta.expr.TrueExpr
import graft.meta.model._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Row-level CDC changelog over a snapshot range (the read-side complement
  * of the streaming equality-delete upsert sink; ref incremental scan
  * `core/.../IncrementalDataTableScan.java:57` — the reference era exposes
  * appends-only incremental reads, this extends the same lineage walk to
  * full insert/delete changelogs, the semantics later formalized as
  * Iceberg's changelog scan).
  *
  * Emits the table's columns plus:
  *  - `_change_type`          "insert" | "delete"
  *  - `_commit_snapshot_id`   the snapshot that committed the change
  *  - `_change_ordinal`       commit order within the range, 0-based
  *
  * Per snapshot in `(from, to]`, oldest first (compaction `replace`
  * snapshots are skipped — they change layout, not rows):
  *  - data files ADDED        → their rows as inserts
  *  - data files REMOVED      → their rows AS VISIBLE AT THE PARENT
  *    (merge-on-read deletes already applicable then are applied first,
  *    so a CoW rewrite doesn't resurrect rows a delete file suppressed)
  *  - delete files ADDED      → the suppressed rows, reconstituted from the
  *    referenced data files at parent visibility, as deletes
  *
  * An update written as merge-on-read (position delete + new data file in
  * one snapshot) therefore surfaces as delete(old row) + insert(new row)
  * with the same `_commit_snapshot_id` — standard changelog form.
  *
  * Scale shape: the lineage walk and live-set diffs are metadata-only on
  * the driver (the same manifests a plan reads); row reconstitution reads
  * only the files the snapshot touched, not the table, and the delete
  * semi-joins broadcast the (small) delete-file tuples. Nothing here is
  * O(table) except a changelog that genuinely spans the whole history.
  */
object Changelog {

  val ChangeTypeCol = "_change_type"
  val SnapshotIdCol = "_commit_snapshot_id"
  val OrdinalCol = "_change_ordinal"

  val Insert = "insert"
  val Delete = "delete"

  def changes(table: IceTable, fromId: Option[Long], toId: Option[Long]): DataFrame = {
    val spark = table.spark
    val m = table.meta
    val schema = m.schema
    val outType = schema.struct
      .add(ChangeTypeCol, StringType, nullable = false)
      .add(SnapshotIdCol, LongType, nullable = false)
      .add(OrdinalCol, IntegerType, nullable = false)
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outType)

    val to = toId
      .map(id => m.snapshot(id).getOrElse(
        throw new ValidationException(s"Unknown snapshot: $id")))
      .orElse(m.currentSnapshot)
      .getOrElse(return empty)
    // lineage (from, to] oldest-first; same ancestor validation as the
    // incremental scan — a `from` that is not an ancestor (e.g. after a
    // rollback) must fail, not silently replay from the root
    val lineage = Iterator.iterate(Option(to))(s =>
        s.flatMap(_.parentId).flatMap(m.snapshot))
      .takeWhile(s => s.isDefined && !fromId.contains(s.get.snapshotId))
      .flatten.toSeq.reverse
    fromId.foreach { fid =>
      require(lineage.headOption.flatMap(_.parentId).contains(fid) ||
        lineage.isEmpty, s"$fid is not an ancestor of ${to.snapshotId}")
    }
    if (lineage.isEmpty) return empty

    // live (data, delete) file maps keyed by normalized path; the walk diffs
    // consecutive snapshots, so "removed" needs no tombstone entries
    def liveMaps(snap: SnapshotMeta)
        : (Map[String, (DataFileMeta, Long)], Map[String, (DataFileMeta, Long)]) = {
      val (del, data) = table.liveEntries(m, snap)
        .partition(_.dataFile.content != FileContent.Data)
      (data.map(e => table.normPath(e.dataFile.path) -> (e.dataFile, e.sequenceNumber)).toMap,
        del.map(e => table.normPath(e.dataFile.path) -> (e.dataFile, e.sequenceNumber)).toMap)
    }

    var (prevData, prevDeletes) =
      fromId.flatMap(m.snapshot).map(liveMaps)
        .getOrElse((Map.empty[String, (DataFileMeta, Long)],
          Map.empty[String, (DataFileMeta, Long)]))

    val branches = Seq.newBuilder[DataFrame]
    lineage.zipWithIndex.foreach { case (snap, ord) =>
      val (curData, curDeletes) = liveMaps(snap)
      if (snap.operation != Operation.Replace) {
        def stamp(df: DataFrame, tpe: String): DataFrame = df
          .withColumn(ChangeTypeCol, lit(tpe))
          .withColumn(SnapshotIdCol, lit(snap.snapshotId))
          .withColumn(OrdinalCol, lit(ord))

        val addedData = (curData -- prevData.keySet).values.toSeq
        val removedData = (prevData -- curData.keySet).values.toSeq
        val addedDeletes = (curDeletes -- prevDeletes.keySet).values.toSeq
        val parentDeletes = prevDeletes.values.toSeq

        // inserts: rows of freshly added data files, read plain
        if (addedData.nonEmpty) {
          val tasks = addedData.map { case (f, seq) => FileScanTask(f, TrueExpr, seq) }
          branches += stamp(Reads.readFiles(spark, table, m, tasks,
            schema.columnNames, TrueExpr), Insert)
        }
        // deletes: rows of removed data files, at parent visibility
        if (removedData.nonEmpty) {
          val tasks = removedData.map { case (f, seq) => FileScanTask(f, TrueExpr, seq) }
          branches += stamp(Reads.readTasksWithDeletes(table, m, tasks,
            parentDeletes, schema.columnNames, TrueExpr, rowPositions = false), Delete)
        }
        // deletes: rows suppressed by freshly added delete files,
        // reconstituted from the referenced data files at parent visibility
        if (addedDeletes.nonEmpty)
          branches ++= deleteFileRows(table, m, addedDeletes, prevData, parentDeletes)
            .map(stamp(_, Delete))
      }
      prevData = curData
      prevDeletes = curDeletes
    }

    val out = branches.result()
    if (out.isEmpty) empty
    else out.map(_.select(outType.fieldNames.map(col): _*)).reduce(_ unionByName _)
  }

  /** Rows a batch of freshly committed delete files suppress. Position
    * deletes name their target files outright (the tuple scan is
    * metadata-sized); equality deletes are scoped to the parent-live data
    * files they can apply to by the sequence/partition rule. Rows are
    * identified by (file, pos), so overlapping position and equality matches
    * within one snapshot dedup exactly. */
  private def deleteFileRows(table: IceTable, m: TableMetadata,
      addedDeletes: Seq[(DataFileMeta, Long)],
      parentData: Map[String, (DataFileMeta, Long)],
      parentDeletes: Seq[(DataFileMeta, Long)]): Seq[DataFrame] = {
    val spark = table.spark
    val schema = m.schema
    val posFiles = addedDeletes.filter(_._1.content == FileContent.PositionDeletes)
    val eqFiles = addedDeletes.filter(_._1.content == FileContent.EqualityDeletes)

    // candidate data files the new deletes can touch (parent-live only)
    val posTuples =
      if (posFiles.isEmpty) None
      else Some(spark.read.parquet(posFiles.map(_._1.path): _*)
        .select(col(MergeOnRead.PosPathCol), col(MergeOnRead.PosPosCol)))
    // referenced paths: metadata-scale collect (bounded by files the DML
    // touched), lets the reconstitution read only those files
    val posPaths: Set[String] = posTuples
      .map(_.select(MergeOnRead.normPathCol(col(MergeOnRead.PosPathCol)))
        .distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)

    val candidates: Seq[FileScanTask] = parentData.collect {
      case (norm, (f, seq))
          if posPaths.contains(norm) || eqFiles.exists { case (d, dseq) =>
            MergeOnRead.applies(d, dseq, FileScanTask(f, TrueExpr, seq)) } =>
        FileScanTask(f, TrueExpr, seq)
    }.toSeq
    if (candidates.isEmpty) return Nil

    // (file, pos) identity needs parquet metadata columns; position deletes
    // only exist over parquet, so needing them implies having them
    val needPos = posFiles.nonEmpty
    val visible = Reads.readTasksWithDeletes(table, m, candidates, parentDeletes,
      schema.columnNames, TrueExpr, rowPositions = needPos)

    var matched = Seq.empty[DataFrame]
    posTuples.foreach { pos =>
      matched :+= visible.join(broadcast(pos),
        visible(TableScan.MetaFileCol) === pos(MergeOnRead.PosPathCol) &&
          visible(TableScan.MetaPosCol) === pos(MergeOnRead.PosPosCol),
        "left_semi")
    }
    eqFiles.groupBy(_._1.equalityIds).foreach { case (ids, fs) =>
      val keyNames = ids.map(schema.fieldName)
      val keys = spark.read.parquet(fs.map(_._1.path): _*)
        .select(keyNames.map(col): _*).dropDuplicates(keyNames)
      val kdf = broadcast(keys)
      val cond = keyNames.map(n => visible(n) <=> kdf(n)).reduce(_ && _)
      matched :+= visible.join(kdf, cond, "left_semi")
    }
    if (!needPos) matched
    else {
      // exact row-identity dedup across overlapping pos/eq matches
      val merged = matched.reduce(_ unionByName _)
        .dropDuplicates(TableScan.MetaFileCol, TableScan.MetaPosCol)
      Seq(merged.drop(TableScan.MetaFileCol, TableScan.MetaPosCol))
    }
  }
}
