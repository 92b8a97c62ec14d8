package graft.spark

import graft.meta.PartitionSpec
import graft.meta.expr.{And => GAnd, Expr => GExpr, SparkConv, TrueExpr}
import graft.meta.model.{DataFileMeta, TableMetadata, TableProperties}
import graft.meta.transforms.IdentityTransform
import graft.table.{FileScanTask, IceTable, SparkFilterConv}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, GenericInternalRow, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** A byte range of one data file (whole file, or one split of a file larger
  * than the split target — ref `BaseTableScan.planFiles` splits at
  * `split-size` so one huge file fans out across executors). */
final case class FileSlice(path: String, start: Long, length: Long, fileSize: Long)

/** One read task: a size-packed group of file slices sharing a writer schema
  * (and, when key-grouped, one partition tuple), with the serialized reader
  * function Spark's `FileFormat` produced on the driver. `columnar` marks
  * that the reader yields `ColumnarBatch`es (vectorized parquet/ORC);
  * `key` is the partition tuple for storage-partitioned joins (null when the
  * scan does not report key-grouped partitioning). */
final case class GraftInputPartition(
    files: Array[FileSlice],
    reader: PartitionedFile => Iterator[InternalRow],
    project: Option[Seq[Expression]],
    columnar: Boolean = false,
    key: InternalRow = null) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Executor-side readers over [[GraftInputPartition]]s; row or columnar
  * according to how the partition's reader was built (ref
  * `spark3/.../source/ReaderFactory` row/batch split). */
object GraftReaderFactory extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition.asInstanceOf[GraftInputPartition].columnar

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val proj = p.project.map(UnsafeProjection.create)
      private val it: Iterator[InternalRow] = p.files.iterator.flatMap { s =>
        val rows = p.reader(
          ColumnBridge.partitionedFile(s.path, s.start, s.length, s.fileSize))
        // a columnar reader yields batches disguised as rows — flatten
        if (p.columnar) rows.flatMap(b =>
          b.asInstanceOf[AnyRef].asInstanceOf[ColumnarBatch].rowIterator()
            .asInstanceOf[java.util.Iterator[InternalRow]].asScalaIterator)
        else rows
      }
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = proj.map(_(row)).getOrElse(row)
      override def close(): Unit = ()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    require(p.columnar, s"partition is not columnar: $p")
    new PartitionReader[ColumnarBatch] {
      private val it: Iterator[ColumnarBatch] = p.files.iterator.flatMap { s =>
        p.reader(ColumnBridge.partitionedFile(s.path, s.start, s.length, s.fileSize))
          .asInstanceOf[Iterator[ColumnarBatch]]
      }
      private var batch: ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) { batch = it.next(); true } else false
      override def get(): ColumnarBatch = batch
      override def close(): Unit = ()
    }
  }

  private implicit final class JIter[A](val it: java.util.Iterator[A]) {
    def asScalaIterator: Iterator[A] = new Iterator[A] {
      override def hasNext: Boolean = it.hasNext
      override def next(): A = it.next()
    }
  }
}

/** Driver-side planning of DSv2 input partitions from planned data files.
  * Shared by the batch scan and the micro-batch stream. Files are grouped by
  * writer schema (field-ID resolution across renames/promotions, imported
  * identity-partition constants — same rules as `Reads.readFiles`), then
  * size-packed into tasks (ref `core/.../util/TableScanUtil.planTasks`).
  *
  * Columnar: when no group needs a row-level projection (no casts, no
  * constants, no missing columns) and every format supports batch reads for
  * the projected schema, readers are built vectorized and the scan reports
  * columnar partitions — the same whole-stage-friendly shape
  * `FileSourceScanExec` produces.
  */
object GraftReadPlanner {

  final case class Planned(partitions: Array[GraftInputPartition], columnar: Boolean)

  /** @param wantKeys group per partition tuple and attach partition keys
    *                 (caller guarantees a single all-identity spec)
    * @param pushedV1 data-source filters in CURRENT-schema names; forwarded
    *                 to the file reader for row-group/SArg pruning only where
    *                 writer-era names and types match exactly */
  def plan(spark: SparkSession, m: TableMetadata, files: Seq[DataFileMeta],
      names: Seq[String], pushedV1: Seq[Filter], splitTarget: Long,
      wantColumnar: Boolean, wantKeys: Boolean): Planned = {
    if (files.isEmpty) return Planned(Array.empty, columnar = false)
    val schema = m.schema
    val inject = m.property(TableProperties.InjectPartitionConstants, "false").toBoolean

    val groups = files.groupBy(f => (f.schemaId, f.format,
      if (inject || wantKeys) f.partition else Nil, f.specId))
      .toSeq.sortBy(_._1.toString)

    // resolve each group's read schema + row projection first; columnar is
    // all-or-nothing across the scan (Spark requires uniform partitions)
    final case class GroupPlan(files: Seq[DataFileMeta], format: String,
        writeSchema: StructType, required: StructType,
        project: Option[Seq[Expression]], filters: Seq[Filter],
        key: InternalRow)

    val plans = groups.map { case ((schemaId, format, partValues, specId), group) =>
      val writeSchema = m.schemas.find(_.schemaId == schemaId).getOrElse(schema)
      val spec0 = m.specById(specId)
      val constants: Map[Int, Any] = if (!inject) Map.empty
      else spec0.fields.zipWithIndex.collect {
        case (pf, i) if pf.transform == IdentityTransform =>
          pf.sourceId -> partValues.asInstanceOf[Seq[Any]](i)
      }.toMap
      // writer-era names/types; columns the writer never had keep their
      // current name (absent from the file → read as null)
      val required = StructType(names.map { name =>
        val id = schema.fieldId(name)
        writeSchema.idToName.get(id) match {
          case Some(old) => StructField(old, writeSchema.fieldType(id))
          case None => StructField(name, schema.fieldType(id))
        }
      })
      // field-ID projection writer row → current row
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
      // a filter is safe for the reader iff every referenced column keeps
      // its current name AND type in the writer schema (a renamed column
      // could otherwise collide with a different old column of that name)
      def safeRef(ref: String): Boolean = {
        val top = ref.split('.').head
        scala.util.Try(schema.fieldId(top)).toOption.exists { id =>
          !constants.contains(id) &&
            writeSchema.idToName.get(id).contains(top) &&
            writeSchema.fieldType(id) == schema.fieldType(id)
        }
      }
      val safeFilters = pushedV1.filter(_.references.forall(safeRef))
      val key: InternalRow = if (!wantKeys) null else {
        val values = spec0.fields.zipWithIndex.map { case (pf, i) =>
          SparkConv.catalystValue(partValues.asInstanceOf[Seq[Any]](i),
            schema.fieldType(pf.sourceId))
        }
        new GenericInternalRow(values.toArray)
      }
      GroupPlan(group, format, writeSchema.struct, required,
        if (identity) None else Some(exprs), safeFilters, key)
    }

    val columnar = wantColumnar && plans.forall(p =>
      p.project.isEmpty && (p.format == "parquet" || p.format == "orc"))

    // build readers; if any format declines batch output, fall back to rows
    def build(vectorized: Boolean): Option[Planned] = {
      val partitions = plans.flatMap { p =>
        val (reader, batches) = ColumnBridge.fileReader(spark, p.format,
          p.writeSchema, p.required, p.filters, vectorized)
        if (vectorized && !batches) return None
        pack(p.files, splitTarget).map(slicePack => GraftInputPartition(
          slicePack.toArray,
          reader, p.project, columnar = vectorized && batches, key = p.key))
      }
      Some(Planned(partitions.toArray, columnar = vectorized))
    }
    (if (columnar) build(vectorized = true) else None)
      .orElse(build(vectorized = false)).get
  }

  /** Byte-range slices of one file: files over the split target fan out into
    * target-sized ranges (readers snap ranges to row-group/stripe/block
    * boundaries), so one huge file spreads across executors instead of
    * pinning a single task (ref `BaseTableScan.planFiles` splitting). The
    * last slice absorbs a sub-10% tail rather than spawning a sliver task. */
  private def slices(f: DataFileMeta, splitTarget: Long): Seq[FileSlice] =
    if (f.fileSizeBytes <= splitTarget + splitTarget / 10)
      Seq(FileSlice(f.path, 0L, f.fileSizeBytes, f.fileSizeBytes))
    else {
      // ceil-divide then equal-size ranges: a 1.9×target file becomes two
      // ~0.95×target slices, never one straggler ~2×target slice
      val n = ((f.fileSizeBytes + splitTarget - 1) / splitTarget).toInt
      val each = f.fileSizeBytes / n
      (0 until n).map { i =>
        val start = i.toLong * each
        val len = if (i == n - 1) f.fileSizeBytes - start else each
        FileSlice(f.path, start, len, f.fileSizeBytes)
      }
    }

  /** Greedy size-packed splits (ref `TableScanUtil.planTasks` bin-pack). */
  private def pack(group: Seq[DataFileMeta], splitTarget: Long): Seq[Seq[FileSlice]] = {
    val packs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[FileSlice])
    var acc = 0L
    group.flatMap(slices(_, splitTarget)).foreach { s =>
      if (acc > 0 && acc + s.length > splitTarget) {
        packs += scala.collection.mutable.ArrayBuffer.empty[FileSlice]
        acc = 0L
      }
      packs.last += s; acc += s.length
    }
    packs.filter(_.nonEmpty).map(_.toSeq).toSeq
  }
}

/** Native DSv2 batch scan (ref `spark3/.../source/SparkBatchQueryScan.java`):
  * metadata pruning on the driver, Spark `FileFormat` readers (vectorized
  * where possible) on executors. Used when no merge-on-read delete files
  * apply — the V1 fallback handles those via the union/anti-join plan.
  *
  *  - `SupportsRuntimeV2Filtering`: join-driven runtime predicates (dynamic
  *    partition pruning) re-run the pruning cascade and drop whole files
  *    before any executor reads them (ref `SparkBatchQueryScan.filter`).
  *  - `SupportsReportPartitioning`: identity-partitioned tables report
  *    `KeyGroupedPartitioning`, enabling storage-partitioned joins with no
  *    shuffle on either side when `spark.sql.sources.v2.bucketing.enabled`.
  *  - `SupportsReportStatistics`: post-pruning sizes feed broadcast/AQE
  *    decisions.
  */
final class GraftBatchScan(val table: IceTable, filter: GExpr,
    projection: StructType, pushedV1: Seq[Filter],
    snapshotId: Option[Long], asOfMillis: Option[Long],
    splitSize: Option[Long], streamSkipDeletes: Boolean,
    maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering with SupportsReportPartitioning {

  private var runtimeExpr: GExpr = TrueExpr
  private var runtimeV1: Seq[Filter] = Nil
  @transient private var cachedTasks: Seq[FileScanTask] = _
  @transient private var cachedPlan: GraftReadPlanner.Planned = _

  private def newGraftScan() = {
    var s = table.newScan()
    snapshotId.foreach(id => s = s.useSnapshot(id))
    asOfMillis.foreach(ts => s = s.asOfTime(ts))
    val combined = GAnd(filter, runtimeExpr)
    if (combined != TrueExpr) s = s.filter(combined)
    if (projection.nonEmpty) s = s.select(projection.fieldNames.toSeq: _*)
    s
  }

  private def tasks: Seq[FileScanTask] = synchronized {
    if (cachedTasks == null) cachedTasks = newGraftScan().planFiles()
    cachedTasks
  }

  override def readSchema(): StructType = projection

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new graft.streaming.GraftMicroBatchStream(table, projection, filter,
      streamSkipDeletes, maxFilesPerTrigger)

  override def estimateStatistics(): Statistics = {
    val t = tasks
    val bytes = t.map(_.file.fileSizeBytes).sum
    val rows = t.map(_.file.recordCount).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  /** All-identity current spec covering every planned file → key-grouped. */
  private def keyedSpec: Option[PartitionSpec] = {
    val s = table.meta.spec
    if (s.isPartitioned && s.fields.forall(_.transform == IdentityTransform) &&
      tasks.nonEmpty && tasks.forall(_.file.specId == s.specId)) Some(s)
    else None
  }

  override def outputPartitioning(): Partitioning = keyedSpec match {
    case Some(spec) =>
      val schema = table.meta.schema
      val keys = spec.fields.map(f =>
        Expressions.identity(schema.idToName(f.sourceId)))
      new KeyGroupedPartitioning(keys.toArray,
        tasks.map(_.file.partition).distinct.size)
    case None => new UnknownPartitioning(0)
  }

  override def planInputPartitions(): Array[InputPartition] = synchronized {
    if (cachedPlan == null) {
      val m = table.meta
      val split = splitSize
        .orElse(m.properties.get(TableProperties.SplitSize).map(_.toLong))
        .getOrElse(TableProperties.SplitSizeDefault)
      cachedPlan = GraftReadPlanner.plan(table.spark, m, tasks.map(_.file),
        projection.fieldNames.toSeq, pushedV1 ++ runtimeV1, split,
        wantColumnar = true, wantKeys = keyedSpec.nonEmpty)
    }
    cachedPlan.partitions.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftReaderFactory

  /** Runtime-filterable columns: partition source columns across specs —
    * a runtime IN on them prunes via partition projection AND file metrics
    * (ref `SparkBatchQueryScan.filterAttributes`). */
  override def filterAttributes(): Array[NamedReference] = {
    val schema = table.meta.schema
    table.meta.specs.flatMap(_.fields).map(_.sourceId).distinct
      .flatMap(schema.idToName.get).map(Expressions.column).toArray
  }

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val v1 = ColumnBridge.predicatesToV1(predicates)
    val conv = v1.flatMap(f => SparkFilterConv.fromV1(f).map(f -> _))
    if (conv.nonEmpty) synchronized {
      runtimeV1 = runtimeV1 ++ conv.map(_._1)
      runtimeExpr = conv.map(_._2).foldLeft(runtimeExpr)(GAnd(_, _))
      cachedTasks = null
      cachedPlan = null
    }
  }

  override def description(): String =
    s"GraftBatchScan(table=${table.location}, filter=$filter, runtime=$runtimeExpr)"
}
