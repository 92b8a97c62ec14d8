package graft.streaming

import graft.meta.expr.{Binder, Expr, InclusiveMetricsEvaluator, TrueExpr}
import graft.meta.model.{DataFileMeta, TableProperties}
import graft.table.{IceTable, Reads}

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
    pushedFilter: Expr, skipDeleteSnapshots: Boolean) extends MicroBatchStream {

  override def initialOffset(): Offset = GraftStreamOffset(-1L)

  override def latestOffset(): Offset =
    GraftStreamOffset(table.meta.currentSnapshotId.getOrElse(-1L))

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
