package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import graft.meta.expr.{And => GAnd, Expr => GExpr, SparkConv, TrueExpr}
import graft.table.{IceTable, SparkFilterConv}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan => V1TableScan}
import org.apache.spark.sql.types.StructType

/** DSv2 table facade over [[IceTable]] (ref `spark3/.../SparkTable.java`).
  * Reads push filters + column pruning into the metadata cascade
  * (manifest summaries → partition values → file metrics → residual), then
  * execute as a V1 relation whose RDD comes from the already-pruned
  * DataFrame — Spark's parquet reader, vectorization and codegen all apply;
  * only PLANNING is graft's (the same division as the reference, where
  * `SparkBatchScan.planInputPartitions` wraps core's file planning).
  */
class GraftSparkTable(val table: IceTable, fullName: String,
    snapshotId: Option[Long] = None, asOfMillis: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def name(): String = fullName

  /** Row-lineage metadata columns (ref `core/.../MetadataColumns.java:35-39`
    * `_file`/`_pos`): the data file a row came from (the manifest path) and
    * its ordinal within that file — the coordinates position deletes use.
    * Hidden from `SELECT *`; a data column with the same name shadows the
    * metadata column. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    val dataNames = table.schema.struct.fieldNames.toSet
    GraftSparkTable.MetaCols.filterNot(c => dataNames.contains(c.name()))
  }

  /** Native SQL DELETE path (ref `SparkTable.java` canDeleteWhere/deleteWhere):
    * Spark plans `DeleteFromTableExec` when every filter converts exactly;
    * non-convertible conditions are intercepted earlier by
    * [[RewriteGraftDml]] and run as a CoW rewrite instead. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => SparkFilterConv.fromV1Strict(f).nonEmpty)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val expr = filters.flatMap(SparkFilterConv.fromV1Strict)
      .foldLeft(TrueExpr: GExpr)(GAnd(_, _))
    table.delete(expr)
  }

  override def schema(): StructType = table.schema.struct

  override def partitioning(): Array[Transform] =
    GraftCatalog.toTransforms(table.schema, table.spec)

  override def properties(): util.Map[String, String] =
    table.meta.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.TRUNCATE)

  /** Read options (ref `SparkReadOptions.java`): `snapshot-id`,
    * `as-of-timestamp` (time travel via `spark.read.option`), `branch` /
    * `tag` (named-ref reads), `split-size` (per-read task sizing),
    * `streaming-skip-delete-snapshots` (stream CDC convention). SQL
    * `VERSION/TIMESTAMP AS OF` arrives through the constructor instead; an
    * explicit option wins. */
  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder = {
    val refSnap = Option(options.get("branch")).orElse(Option(options.get("tag")))
      .map { name =>
        if (name == graft.meta.model.SnapshotRefMeta.MainBranch)
          table.meta.currentSnapshotId.getOrElse(throw new graft.table.ValidationException(
            "Table has no current snapshot"))
        else table.meta.refs.getOrElse(name,
          throw new graft.table.ValidationException(s"Unknown ref: $name")).snapshotId
      }
    val snap = Option(options.get("snapshot-id")).map(_.toLong)
      .orElse(refSnap).orElse(snapshotId)
    val asOf = Option(options.get("as-of-timestamp")).map(_.toLong).orElse(asOfMillis)
    val split = Option(options.get("split-size")).map(_.toLong)
    val skipDeletes = Option(options.get("streaming-skip-delete-snapshots"))
      .forall(_.toBoolean)
    val maxFiles = Option(options.get("max-files-per-trigger")).map(_.toInt)
    // incremental batch read (ref SparkReadOptions start/end-snapshot-id):
    // plan only the files appended in (start, end]
    val appendsRange = Option(options.get("start-snapshot-id")).map(_.toLong).map { from =>
      val to = Option(options.get("end-snapshot-id")).map(_.toLong)
        .orElse(table.meta.currentSnapshotId).getOrElse(
          throw new graft.table.ValidationException("Table has no snapshot"))
      (from, to)
    }
    if (appendsRange.isEmpty && options.containsKey("end-snapshot-id"))
      throw new graft.table.ValidationException(
        "end-snapshot-id requires start-snapshot-id (incremental reads are a range)")
    // FILE-level sampling (TableScan.sampleFiles): `sample-files` fraction
    // + optional `sample-seed` — approximate by design (see the scan API)
    val sample = Option(options.get("sample-files")).map(_.toDouble).map { f =>
      (f, Option(options.get("sample-seed")).map(_.toLong).getOrElse(0L))
    }
    new GraftScanBuilder(table, snap, asOf, split, skipDeletes, maxFiles,
      appendsRange, appendsEndExplicit = options.containsKey("end-snapshot-id"),
      sample = sample)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(table, GraftWriteBuilder.overrides(info),
      branch = Option(info.options.get("branch")),
      snapshotProps = GraftWriteBuilder.snapshotProps(info))
}

/** Read-only DSv2 facade over one metadata table (`db.t.snapshots` etc.;
  * ref `spark3/.../SparkCatalog.load` resolving `MetadataTableType`). The
  * DataFrame is recomputed per scan so each query sees current metadata. */
final class GraftMetadataTable(table: IceTable, metaName: String, fullName: String)
    extends Table with SupportsRead {

  override def name(): String = fullName

  override def schema(): StructType = table.metadataTable(metaName).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    () => new V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[T <: BaseRelation with V1TableScan](
          context: SQLContext): T = {
        new BaseRelation with V1TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = readSchema()
          override def needConversion: Boolean = false
          override def buildScan(): RDD[Row] =
            org.apache.spark.sql.graft.ColumnBridge
              .toInternalRdd(table.metadataTable(metaName)).asInstanceOf[RDD[Row]]
        }.asInstanceOf[T]
      }
      override def description(): String = s"GraftMetadataScan($fullName)"
    }
}

/** Filter + projection pushdown (ref `SparkScanBuilder.java:100`). Converted
  * filters drive metadata pruning; ALL filters are returned as post-scan
  * residuals so Spark re-applies them — pruning is an optimization, row-level
  * semantics stay with Spark.
  *
  * Aggregate pushdown (ref `SparkScanBuilder.pushAggregation`): unfiltered
  * COUNT/MIN/MAX are answered from manifest metrics alone — no data files are
  * opened. MIN/MAX only for types whose bounds are exact (strings are
  * truncated to 16 chars at write, float/double bounds are NaN-unreliable).
  * The partial row is re-aggregated by Spark (`supportCompletePushDown` =
  * false), so empty tables and null-only columns keep exact SQL semantics. */
object GraftSparkTable {
  import org.apache.spark.sql.connector.catalog.MetadataColumn
  import org.apache.spark.sql.types.{DataType, LongType, StringType}

  val FileCol = "_file"
  val PosCol = "_pos"
  val DeletedCol = "_deleted"
  /** Row lineage (the v3 direction): `_row_id` = a row's STABLE identity
    * (the file's commit-assigned first-row-id + position, or the
    * materialized id a preserving rewrite carried); `_last_updated_seq` =
    * the sequence number of the commit that last produced the row. Null
    * on files committed before lineage assignment existed. */
  val RowIdCol = "_row_id"
  val LastUpdatedCol = "_last_updated_seq"
  val MetaColNames: Set[String] =
    Set(FileCol, PosCol, DeletedCol, RowIdCol, LastUpdatedCol)

  private def metaCol(colName: String, dt: DataType,
      nullable: Boolean = false): MetadataColumn =
    new MetadataColumn {
      override def name(): String = colName
      override def dataType(): DataType = dt
      override def isNullable: Boolean = nullable
    }

  val MetaCols: Array[MetadataColumn] =
    Array(metaCol(FileCol, StringType), metaCol(PosCol, LongType),
      metaCol(DeletedCol, org.apache.spark.sql.types.BooleanType),
      metaCol(RowIdCol, LongType, nullable = true),
      metaCol(LastUpdatedCol, LongType, nullable = true))
}

final class GraftScanBuilder(table: IceTable, snapshotId: Option[Long],
    asOfMillis: Option[Long], splitSize: Option[Long] = None,
    streamSkipDeletes: Boolean = true, maxFilesPerTrigger: Option[Int] = None,
    appendsRange: Option[(Long, Long)] = None,
    appendsEndExplicit: Boolean = false,
    sample: Option[(Double, Long)] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var pushedExpr: GExpr = TrueExpr
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = table.schema.struct
  // requested _file/_pos metadata columns, in their requested positions
  // relative to the data columns (Spark appends them after data columns;
  // the permutation keeps us correct either way)
  private var metaRequested: Seq[(String, Int)] = Nil
  private var aggResult: Option[(StructType, InternalRow)] = None
  private var pushedLimit: Option[Int] = None

  /** LIMIT pushdown as a FILE-PLANNING cap (partial push — Spark keeps its
    * own limit operator): with no pushed filter and no merge-on-read
    * deletes, every planned row is visible, so planning stops at the first
    * files whose record counts cover the limit. With filters or deletes the
    * counts over-estimate visible rows and a cap could under-deliver, so
    * the push is declined. */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedExpr == TrueExpr && plannedDeletes.isEmpty) {
      pushedLimit = Some(limit); true
    } else false
  }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // predicates on _file/_pos/_deleted are row-lineage conditions the
    // metadata cascade cannot evaluate — leave them entirely post-scan
    val converted = filters
      .filterNot(_.references.exists(r =>
        GraftSparkTable.MetaColNames.contains(r.split('.').head)))
      .flatMap(f => SparkFilterConv.fromV1(f).map(f -> _))
    pushed = converted.map(_._1)
    pushedExpr = converted.map(_._2).foldLeft(TrueExpr: GExpr)(GAnd(_, _))
    filters // Spark evaluates every filter post-scan (safe double-filtering)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // resolve against the table schema to keep field-ID metadata
    val byName = table.schema.struct.fields.map(f => f.name -> f).toMap
    val (meta, data) = requiredSchema.fields.zipWithIndex.partition {
      case (f, _) => !byName.contains(f.name) &&
        GraftSparkTable.MetaColNames.contains(f.name)
    }
    this.metaRequested = meta.toSeq.map { case (f, i) => (f.name, i) }
    this.requiredSchema = StructType(
      data.flatMap { case (f, _) => byName.get(f.name) })
  }

  /** Output layout for the scan: data-column ordinal (>= 0), or
    * [[GraftBatchScan.OutFile]] / [[GraftBatchScan.OutPos]] for metadata
    * columns, in the requested output order. Null when no metadata column
    * is requested (the common case keeps its exact legacy path). */
  private def outCols: Array[Int] =
    if (metaRequested.isEmpty) null
    else {
      val metaAt = metaRequested.toMap.map(_.swap) // position -> name
      val out = new Array[Int](requiredSchema.length + metaRequested.size)
      var dataOrd = 0
      var i = 0
      while (i < out.length) {
        out(i) = metaAt.get(i) match {
          case Some(GraftSparkTable.FileCol) => GraftBatchScan.OutFile
          case Some(GraftSparkTable.PosCol) => GraftBatchScan.OutPos
          case Some(GraftSparkTable.DeletedCol) => GraftBatchScan.OutDeleted
          case Some(GraftSparkTable.RowIdCol) => GraftBatchScan.OutRowId
          case Some(GraftSparkTable.LastUpdatedCol) =>
            GraftBatchScan.OutLastUpdated
          case Some(other) =>
            throw new IllegalStateException(s"unknown metadata column $other")
          case None => val d = dataOrd; dataOrd += 1; d
        }
        i += 1
      }
      out
    }

  private def baseScan() = {
    var s = table.newScan()
    snapshotId.foreach(id => s = s.useSnapshot(id))
    asOfMillis.foreach(ts => s = s.asOfTime(ts))
    s
  }

  // planned once per query: pushAggregation and build() both ask — on a
  // table with thousands of manifests a second walk doubles compile-time IO
  private lazy val plannedContent = baseScan().planContent()
  private def plannedDeletes = plannedContent._1

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types._
    if (!table.meta.property("read.aggregate-pushdown.enabled", "true").toBoolean)
      return false
    // metadata aggregates answer over the WHOLE snapshot; an incremental
    // scan sees only a range's appends, a sampled scan only its files
    if (appendsRange.nonEmpty || sample.nonEmpty) return false
    // only whole-table aggregates; Spark never offers an aggregation while
    // post-scan filters remain, and we always keep filters post-scan
    if (aggregation.groupByExpressions.nonEmpty || pushedExpr != TrueExpr)
      return false
    val schema = table.meta.schema
    def fieldIdOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Int] =
      e match {
        case nr: org.apache.spark.sql.connector.expressions.NamedReference
            if nr.fieldNames.length == 1 =>
          scala.util.Try(schema.fieldId(nr.fieldNames.head)).toOption
        case _ => None
      }
    def exactBounds(t: DataType): Boolean = t match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           DateType | TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }
    // validate the aggregate shapes BEFORE any metadata planning: an
    // unsupported aggregate (SUM, AVG, distinct COUNT, ...) must not pay a
    // manifest walk just to bail out
    val supported = aggregation.aggregateExpressions.forall {
      case _: CountStar => true
      case c: Count if !c.isDistinct => fieldIdOf(c.column).isDefined
      case m: Min => fieldIdOf(m.column).exists(id => exactBounds(schema.fieldType(id)))
      case m: Max => fieldIdOf(m.column).exists(id => exactBounds(schema.fieldType(id)))
      case _ => false
    }
    if (!supported) return false
    if (plannedDeletes.nonEmpty) return false // MoR deletes hide rows
    val files = baseScan().planFiles().map(_.file)
    def allNull(f: graft.meta.model.DataFileMeta, id: Int): Boolean =
      f.nullCounts.get(id).contains(f.recordCount)
    def bound(id: Int, lower: Boolean): Option[(DataType, Any)] = {
      val t = schema.fieldType(id)
      val usable = exactBounds(t) && files.forall(f =>
        (if (lower) f.lowerBounds else f.upperBounds).contains(id) || allNull(f, id))
      if (!usable) None
      else {
        val bounds = files.flatMap(f =>
          (if (lower) f.lowerBounds else f.upperBounds).get(id))
        val v = bounds.reduceOption { (a, b) =>
          val c = graft.meta.expr.Literals.compare(t, a, b)
          if ((c < 0) == lower) a else b
        }.orNull
        Some((t, SparkConv.catalystValue(v, t)))
      }
    }
    val results: Seq[Option[(DataType, Any)]] = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some((LongType, files.map(_.recordCount).sum))
      case c: Count if !c.isDistinct => fieldIdOf(c.column).flatMap { id =>
        if (files.forall(f => f.valueCounts.contains(id) && f.nullCounts.contains(id)))
          Some((LongType, files.map(f => f.valueCounts(id) - f.nullCounts(id)).sum))
        else None
      }
      case m: Min => fieldIdOf(m.column).flatMap(bound(_, lower = true))
      case m: Max => fieldIdOf(m.column).flatMap(bound(_, lower = false))
      case _ => None
    }
    if (results.exists(_.isEmpty)) return false
    val fields = results.zipWithIndex.map { case (Some((t, _)), i) =>
      org.apache.spark.sql.types.StructField(s"agg_$i", t)
    }
    aggResult = Some((StructType(fields),
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        results.map(_.get._2).toArray)))
    true
  }

  /** Merge-on-read deletes the native scan can apply in its readers:
    * position deletes read the parquet row-index column, or — for ORC/Avro
    * data files — synthesized whole-file row ordinals; equality probing
    * needs hashable atomic key types. Anything else takes the V1
    * union/anti-join plan. */
  private def nativeMoRSupported: Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType => SStructType}
    val (deletes, dataFormats) = plannedContent
    val posOk = !deletes.exists(d =>
        graft.meta.model.FileContent.isPositional(d._1.content)) ||
      dataFormats.subsetOf(Set("parquet", "orc", "avro"))
    val eqOk = deletes.iterator.flatMap(_._1.equalityIds).toSeq.distinct.forall { id =>
      table.meta.schema.fieldType(id) match {
        case _: ArrayType | _: MapType | _: SStructType => false
        case _ => true
      }
    }
    posOk && eqOk
  }

  override def build(): Scan = aggResult match {
    case Some((aggSchema, row)) => new GraftLocalAggScan(table, aggSchema, row)
    case None =>
      // native batch scan (vectorized readers, runtime file pruning,
      // storage-partitioned joins) — including merge-on-read tables, whose
      // deletes the readers apply in place; the V1 union/anti-join plan
      // remains only for delete shapes the readers can't express
      val v1Forced =
        table.meta.property("read.v1-fallback.enabled", "false").toBoolean
      if (appendsRange.nonEmpty)
        // incremental: appended files only, deletes don't apply by contract
        new GraftBatchScan(table, pushedExpr, requiredSchema, pushed.toSeq,
          snapshotId, asOfMillis, splitSize, streamSkipDeletes, maxFilesPerTrigger,
          deletes = Nil, pushedLimit = pushedLimit, appendsRange = appendsRange,
          outCols = outCols, appendsEndExplicit = appendsEndExplicit,
          sample = sample)
      else if (v1Forced || (plannedDeletes.nonEmpty && !nativeMoRSupported)) {
        if (metaRequested.nonEmpty) throw new UnsupportedOperationException(
          "_file/_pos/_deleted metadata columns need the native scan; this " +
            "read took the V1 fallback (read.v1-fallback.enabled or an " +
            "unsupported merge-on-read delete shape)")
        new GraftV1Scan(table, pushedExpr, requiredSchema, snapshotId,
          asOfMillis, splitSize, streamSkipDeletes, maxFilesPerTrigger,
          sample = sample)
      } else
        new GraftBatchScan(table, pushedExpr, requiredSchema, pushed.toSeq,
          snapshotId, asOfMillis, splitSize, streamSkipDeletes, maxFilesPerTrigger,
          deletes = plannedDeletes, pushedLimit = pushedLimit, outCols = outCols,
          sample = sample)
  }
}

/** Metadata-only aggregate result as a `LocalScan` — Spark plans it as a
  * local relation; zero Spark jobs, zero files opened. */
final class GraftLocalAggScan(table: IceTable, aggSchema: StructType,
    row: InternalRow) extends LocalScan {
  override def readSchema(): StructType = aggSchema
  override def rows(): Array[InternalRow] = Array(row)
  override def description(): String =
    s"GraftAggPushdown(table=${table.location})"
}

/** The scan: metadata pruning happens here (driver-side, like ref
  * `SparkBatchScan.tasks()`); execution is delegated through `V1Scan` to the
  * pruned DataFrame's RDD (internal rows, `needConversion = false`). Reports
  * planned-size statistics so Spark's join planning (broadcast thresholds,
  * AQE) sees post-pruning sizes, not raw table sizes. */
final class GraftV1Scan(val table: IceTable, filter: GExpr, projection: StructType,
    snapshotId: Option[Long], asOfMillis: Option[Long],
    splitSize: Option[Long] = None, streamSkipDeletes: Boolean = true,
    maxFilesPerTrigger: Option[Int] = None,
    sample: Option[(Double, Long)] = None)
    extends V1Scan with SupportsReportStatistics {

  /** Structured Streaming entry (ref `SparkMicroBatchStream.java`): offsets
    * are snapshot ids; each batch reads the appended files. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new graft.streaming.GraftMicroBatchStream(table, projection, filter,
      streamSkipDeletes, maxFilesPerTrigger)

  private def newGraftScan() = {
    var s = table.newScan()
    snapshotId.foreach(id => s = s.useSnapshot(id))
    asOfMillis.foreach(ts => s = s.asOfTime(ts))
    splitSize.foreach(b => s = s.option("split-size", b.toString))
    sample.foreach { case (f, sd) => s = s.sampleFiles(f, sd) }
    if (filter != TrueExpr) s = s.filter(filter)
    if (projection.nonEmpty) s = s.select(projection.fieldNames.toSeq: _*)
    s
  }

  // planned once per query: estimateStatistics and buildScan both need the
  // task list — at millions of files re-planning doubles driver metadata work
  private lazy val plannedTasks = newGraftScan().planFiles()

  override def readSchema(): StructType = projection

  override def estimateStatistics(): Statistics = {
    val tasks = plannedTasks
    val bytes = tasks.map(_.file.fileSizeBytes).sum
    val rows = tasks.map(_.file.recordCount).sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }

  override def toV1TableScan[T <: BaseRelation with V1TableScan](
      context: SQLContext): T = {
    val scan = this
    new BaseRelation with V1TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = scan.readSchema()
      override def needConversion: Boolean = false // rows are InternalRow
      override def buildScan(): RDD[Row] = {
        val df =
          if (projection.isEmpty) {
            // COUNT(*)-style scans: no columns required — read the narrowest
            // column and drop it (parquet reads only that column's pages)
            val narrow = scan.table.schema.columnNames.head
            scan.newGraftScan().select(narrow).toDF.drop(narrow)
          } else scan.newGraftScan().toDF
        org.apache.spark.sql.graft.ColumnBridge.toInternalRdd(df)
          .asInstanceOf[RDD[Row]]
      }
    }.asInstanceOf[T]
  }

  override def description(): String =
    s"GraftScan(table=${table.location}, filter=$filter)"
}

/** V1 write path (ref `SparkWriteBuilder`): append, truncate-overwrite,
  * overwrite-by-filter and dynamic partition overwrite all commit through the
  * snapshot protocol. */
object GraftWriteBuilder {
  /** Per-write option → table-property overrides (ref `SparkWriteOptions`):
    * `write-format`, `distribution-mode`, `fanout-enabled` on
    * `df.writeTo(...).option(...)`. */
  def overrides(info: LogicalWriteInfo): Map[String, String] = {
    val o = info.options
    Seq(
      "write-format" -> graft.meta.model.TableProperties.DefaultFileFormat,
      "distribution-mode" -> graft.meta.model.TableProperties.DistributionMode,
      "fanout-enabled" -> graft.meta.model.TableProperties.FanoutEnabled)
      .flatMap { case (opt, prop) => Option(o.get(opt)).map(prop -> _) }.toMap
  }

  /** `option("snapshot-property.X", v)` → custom entries in the commit's
    * snapshot summary (ref SparkWriteOptions SNAPSHOT_PROPERTY_PREFIX).
    * Append paths only — audit tags, pipeline run ids, etc. */
  def snapshotProps(info: LogicalWriteInfo): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    info.options.entrySet().asScala
      .filter(_.getKey.toLowerCase.startsWith("snapshot-property."))
      .map(e => e.getKey.substring("snapshot-property.".length) -> e.getValue)
      .toMap
  }
}

final class GraftWriteBuilder(table: IceTable,
    writeOverrides: Map[String, String] = Map.empty,
    branch: Option[String] = None,
    snapshotProps: Map[String, String] = Map.empty)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite
    with SupportsDynamicOverwrite {

  // None = append; Some(expr) = overwrite rows matching expr; Dynamic = by partition
  private var overwriteExpr: Option[GExpr] = None
  private var dynamic = false

  override def truncate(): WriteBuilder = { overwriteExpr = Some(TrueExpr); this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // strict: a partially-converted filter here would delete rows the original
    // filter does not match (see SparkFilterConv.fromV1Strict)
    val conv = filters.map(f => SparkFilterConv.fromV1Strict(f).getOrElse(
      throw new UnsupportedOperationException(
        s"Cannot overwrite by non-convertible filter: $f")))
    overwriteExpr = Some(conv.foldLeft(TrueExpr: GExpr)(GAnd(_, _)))
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = { dynamic = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        branch match {
          case Some(b) =>
            // branch writes are append-only (the audit-branch pattern)
            if (dynamic || overwriteExpr.nonEmpty)
              throw new UnsupportedOperationException(
                "Only appends can target a branch (option(\"branch\", ...))")
            table.appendToBranch(b, data, snapshotProps)
          case None =>
            // write-audit-publish: with `spark.wap.id` set in the session
            // and the table opted in, INSERTs STAGE a snapshot (not made
            // current) for audit; publish via cherrypick_snapshot (ref
            // SparkWriteConf.wapId / `write.wap.enabled`)
            val wapId = data.sparkSession.conf.getOption("spark.wap.id")
              .filter(_ => table.meta.property("write.wap.enabled", "false").toBoolean)
            // overwrites cannot be staged yet: publishing them mid-audit
            // would defeat WAP, so refuse instead of silently publishing
            if (wapId.nonEmpty && (dynamic || overwriteExpr.nonEmpty))
              throw new UnsupportedOperationException(
                "spark.wap.id staging supports appends only; unset it for overwrites")
            if (dynamic) table.overwritePartitions(data)
            else overwriteExpr match {
              case Some(e) => table.overwrite(e, data)
              case None => wapId match {
                case Some(id) =>
                  table.stageAppend(data, id, snapshotProps, writeOverrides)
                case None => table.append(data, snapshotProps, writeOverrides)
              }
            }
        }
      }
    }
  }
}
