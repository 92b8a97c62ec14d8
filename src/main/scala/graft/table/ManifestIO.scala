package graft.table

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr.Literals
import graft.meta.model._

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Manifest read/write (ref `core/.../ManifestReader.java`,
  * `ManifestWriter`, `PartitionSummary.java`): JSON-lines entries plus
  * per-partition-field range summaries for manifest-level pruning. */
object ManifestIO {

  def write(io: FileIO, path: String, entries: Seq[ManifestEntry],
      schema: Schema, spec: PartitionSpec): ManifestFileMeta = {
    val content = entries.map(JsonCodecs.entryToJson(_, schema, spec)).mkString("\n")
    val length = io.writeString(path, content)
    val live = entries.filter(_.status != EntryStatus.Deleted)
    val summaries = spec.fields.zipWithIndex.map { case (pf, i) =>
      val t = spec.fieldType(schema, pf)
      val values = live.map(_.dataFile.partition(i))
      val nonNull = values.filter(_ != null)
      val isFloating = t == DoubleType || t == FloatType
      FieldSummaryMeta(
        containsNull = values.exists(_ == null),
        containsNan = if (isFloating) Some(nonNull.exists(Literals.isNaN)) else None,
        lowerBound = nonNull.filterNot(Literals.isNaN)
          .reduceOption((a, b) => if (Literals.compare(t, a, b) <= 0) a else b),
        upperBound = nonNull.filterNot(Literals.isNaN)
          .reduceOption((a, b) => if (Literals.compare(t, a, b) >= 0) a else b))
    }
    val added = entries.filter(_.status == EntryStatus.Added)
    val existing = entries.filter(_.status == EntryStatus.Existing)
    val deleted = entries.filter(_.status == EntryStatus.Deleted)
    ManifestFileMeta(
      path = path,
      length = length,
      specId = spec.specId,
      addedSnapshotId = entries.headOption.map(_.snapshotId).getOrElse(-1L),
      minSequenceNumber = (Long.MaxValue +: entries.map(_.sequenceNumber)).min,
      addedFilesCount = added.size,
      existingFilesCount = existing.size,
      deletedFilesCount = deleted.size,
      addedRowsCount = added.map(_.dataFile.recordCount).sum,
      existingRowsCount = existing.map(_.dataFile.recordCount).sum,
      deletedRowsCount = deleted.map(_.dataFile.recordCount).sum,
      partitionSummaries = summaries)
  }

  def read(io: FileIO, path: String, schema: Schema,
      specById: Int => PartitionSpec): Seq[ManifestEntry] =
    io.readLines(path).map(JsonCodecs.entryFromJson(_, schema, specById)).toSeq

  /** Read several manifests on a worker pool (ref `DataTableScan.java:85`
    * plans manifests in parallel on the driver). */
  def readAll(io: FileIO, manifests: Seq[ManifestFileMeta], schema: Schema,
      specById: Int => PartitionSpec): Seq[(ManifestFileMeta, Seq[ManifestEntry])] = {
    if (manifests.size <= 2) {
      manifests.map(m => m -> read(io, m.path, schema, specById))
    } else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ManifestIO.pool
      val fs = manifests.map(m => Future(m -> read(io, m.path, schema, specById)))
      Await.result(Future.sequence(fs), Duration.Inf)
    }
  }

  private[table] lazy val ioPool: scala.concurrent.ExecutionContext = pool

  private lazy val pool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.max(4, Runtime.getRuntime.availableProcessors() / 2),
        r => { val t = new Thread(r, "graft-manifest-io"); t.setDaemon(true); t }))
}
