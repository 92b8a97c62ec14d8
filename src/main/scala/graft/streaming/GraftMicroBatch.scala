package graft.streaming

import graft.meta.expr.{Binder, Expr, InclusiveMetricsEvaluator, SparkConv, TrueExpr}
import graft.meta.model.{DataFileMeta, TableProperties}
import graft.table.{IceTable, Reads}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StructField, StructType}

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

    val schema = m.schema
    val names = projection.fieldNames.toSeq
    val inject = m.property(TableProperties.InjectPartitionConstants, "false").toBoolean
    val splitTarget = m.property(TableProperties.SplitSize,
      (128L * 1024 * 1024).toString).toLong

    files.groupBy(f => (f.schemaId, f.format, if (inject) f.partition else Nil))
      .toSeq.sortBy(_._1.toString)
      .flatMap { case ((schemaId, format, partValues), group) =>
        val writeSchema = m.schemas.find(_.schemaId == schemaId).getOrElse(schema)
        val spec0 = m.specById(group.head.specId)
        val constants: Map[Int, Any] = if (!inject) Map.empty
        else spec0.fields.zipWithIndex.collect {
          case (pf, i) if pf.transform == graft.meta.transforms.IdentityTransform =>
            pf.sourceId -> partValues.asInstanceOf[Seq[Any]](i)
        }.toMap
        // ask the reader for writer-era names/types; columns the writer never
        // had keep their current name (absent from the file → read as null)
        val required = StructType(names.map { name =>
          val id = schema.fieldId(name)
          writeSchema.idToName.get(id) match {
            case Some(old) => StructField(old, writeSchema.fieldType(id))
            case None => StructField(name, schema.fieldType(id))
          }
        })
        // field-ID projection writer row → current row: constants for
        // imported identity partitions, casts for promoted types
        val exprs: Seq[Expression] = names.zipWithIndex.map { case (name, i) =>
          val id = schema.fieldId(name)
          val cur = schema.fieldType(id)
          if (constants.contains(id))
            Literal(SparkConv.catalystValue(constants(id), cur), cur)
          else {
            val in = BoundReference(i, required(i).dataType, nullable = true)
            if (required(i).dataType == cur) in
            else Cast(in, cur, Some(java.time.ZoneOffset.UTC.getId))
          }
        }
        val identity = exprs.zipWithIndex.forall {
          case (b: BoundReference, i) => b.ordinal == i
          case _ => false
        }
        val reader = ColumnBridge.fileRowReader(table.spark, format,
          writeSchema.struct, required)
        // greedy size-packed splits (ref TableScanUtil.planTasks bin-pack)
        val packs = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer.empty[DataFileMeta])
        var acc = 0L
        group.foreach { f =>
          if (acc > 0 && acc + f.fileSizeBytes > splitTarget) {
            packs += scala.collection.mutable.ArrayBuffer.empty[DataFileMeta]
            acc = 0L
          }
          packs.last += f; acc += f.fileSizeBytes
        }
        packs.filter(_.nonEmpty).map(p => GraftInputPartition(
          p.map(f => (f.path, f.fileSizeBytes)).toArray, reader,
          if (identity) None else Some(exprs)))
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory

  override def toString: String =
    s"GraftMicroBatchStream(${table.location})"
}

/** One micro-batch task: a size-packed group of files sharing a writer
  * schema, with the serialized reader function Spark's FileFormat produced. */
final case class GraftInputPartition(files: Array[(String, Long)],
    reader: PartitionedFile => Iterator[InternalRow],
    project: Option[Seq[Expression]]) extends InputPartition

object GraftStreamReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val proj = p.project.map(UnsafeProjection.create)
      private val it: Iterator[InternalRow] = p.files.iterator.flatMap {
        case (path, len) => p.reader(ColumnBridge.partitionedFile(path, len))
      }
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = proj.map(_(row)).getOrElse(row)
      override def close(): Unit = ()
    }
  }
}
