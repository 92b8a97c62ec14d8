package graft.streaming

import graft.meta.expr.{Binder, Expr, InclusiveMetricsEvaluator, TrueExpr}
import graft.meta.model.{DataFileMeta, TableProperties}
import graft.table.{IceTable, Reads}

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Snapshot-id offset of the micro-batch stream (ref `StreamingOffset.java:33`;
  * `-1` = nothing consumed yet). */
final case class GraftStreamOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** DSv2 Structured Streaming source over the snapshot log (ref
  * `spark3/.../source/SparkMicroBatchStream.java`): `spark.readStream
  * .table("graft.db.t")` works directly on catalog tables. Each micro-batch
  * is the files appended between two snapshot ids — planned on the driver,
  * read on executors through Spark's own `FileFormat` readers (row mode).
  *
  * Schema evolution is handled like the batch path (`Reads.readFiles`): files
  * are grouped by writer schema, read under the writer's names/types, and
  * projected to the current schema by field ID (missing columns → null,
  * promoted types → cast, imported identity partitions → constant).
  */
final class GraftMicroBatchStream(table: IceTable, projection: StructType,
    pushedFilter: Expr, skipDeleteSnapshots: Boolean,
    maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow pins the end of the run at prepare time: batches
    * drain up to this snapshot under the read limit, then the query stops
    * even if concurrent writers keep committing. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.meta.currentSnapshotId.getOrElse(-1L))

  private def endSnapshotId: Long = availableNowEnd
    .getOrElse(table.meta.currentSnapshotId.getOrElse(-1L))

  override def initialOffset(): Offset = GraftStreamOffset(-1L)

  override def latestOffset(): Offset = GraftStreamOffset(endSnapshotId)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Rate-limited offset advance (`max-files-per-trigger` read option /
    * `Trigger` read limits): walk the append snapshots after `start` oldest
    * →newest and stop once the added-file budget is spent, always admitting
    * at least one snapshot so the stream progresses. Offsets are
    * snapshot-granular, so the bound is honored at snapshot boundaries; the
    * initial catch-up batch (start = -1, the full current snapshot) is not
    * subdivided. */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val current = endSnapshotId
    val startId = startOffset.asInstanceOf[GraftStreamOffset].snapshotId
    val budget: Option[Long] = limit match {
      case f: ReadMaxFiles => Some(f.maxFiles().toLong)
      case _ => None
    }
    if (budget.isEmpty || startId == -1L || current == -1L || current == startId)
      return GraftStreamOffset(current)
    val appends = table.appendSnapshotsBetween(table.meta, startId, current)
    if (appends.isEmpty) return GraftStreamOffset(current)
    var spent = 0L
    var chosen = startId
    var full = false
    appends.foreach { case (s, n) =>
      // offsets are linear: stop at the FIRST snapshot that does not fit
      // (always admitting at least one so the stream progresses)
      if (!full) {
        if (spent == 0L || spent + n <= budget.get) { spent += n; chosen = s.snapshotId }
        else full = true
      }
    }
    // non-append snapshots after the last admitted append carry no new data
    // files, but advancing past them would skip any append in between — so
    // the offset stops at the last admitted APPEND unless everything fit
    if (chosen == appends.last._1.snapshotId) GraftStreamOffset(current)
    else GraftStreamOffset(chosen)
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val endId = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (endId == -1L) return Array.empty
    val m = table.meta
    val startId = start.asInstanceOf[GraftStreamOffset].snapshotId
    val files: Seq[DataFileMeta] =
      if (startId == -1L) {
        // first batch = the full snapshot, through the pruning cascade
        var scan = table.newScan().useSnapshot(endId)
        if (pushedFilter != TrueExpr) scan = scan.filter(pushedFilter)
        if (scan.planDeletes().nonEmpty) throw new UnsupportedOperationException(
          "Cannot start a stream on a snapshot with merge-on-read delete files; " +
            "compact first (rewriteDataFiles) or use the graft-stream V1 source")
        scan.planFiles().map(_.file)
      } else {
        val appended = table.appendedFilesBetween(m, startId, endId, skipDeleteSnapshots)
        if (pushedFilter == TrueExpr) appended
        else { // metrics-prune appended files; Spark re-applies the filter row-level
          val bound = Binder.bind(m.schema, pushedFilter)
          appended.filter(f => InclusiveMetricsEvaluator.eval(bound, Reads.statsOf(f)))
        }
      }
    if (files.isEmpty) return Array.empty

    val splitTarget = m.property(TableProperties.SplitSize,
      TableProperties.SplitSizeDefault.toString).toLong
    // row-mode readers: micro-batch sinks consume rows; columnar batches are
    // the batch scan's concern
    graft.spark.GraftReadPlanner.plan(table.spark, m, files,
      projection.fieldNames.toSeq, Nil, splitTarget,
      wantColumnar = false, wantKeys = false)
      .partitions.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    graft.spark.GraftReaderFactory

  override def toString: String =
    s"GraftMicroBatchStream(${table.location})"
}
