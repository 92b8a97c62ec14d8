package graft.table

import graft.meta.model._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** One `entries`/`files` metadata-table row in encoder-friendly shape
  * (top-level so the product Encoder derives; built driver- OR
  * executor-side depending on manifest count). */
final case class MetadataEntryRow(
    status: Int,
    snapshot_id: Long,
    sequence_number: Long,
    file_path: String,
    file_format: String,
    spec_id: Int,
    partition: String,
    record_count: Long,
    file_size_in_bytes: Long,
    value_counts: Map[Int, Long],
    null_value_counts: Map[Int, Long],
    lower_bounds: Map[Int, String],
    upper_bounds: Map[Int, String])

/** The reference's 9 metadata tables exposed relationally (ref
  * `core/.../MetadataTableType.java:24-33`, `PartitionsTable.java:74`):
  * SNAPSHOTS, HISTORY, MANIFESTS, FILES, ENTRIES, PARTITIONS and the ALL_*
  * variants (all snapshots, not just current). Built as DataFrames from the
  * metadata tree; PARTITIONS is a groupBy over entries.
  */
object MetadataTables {

  def snapshots(t: IceTable): DataFrame = {
    val m = t.meta
    val rows = m.snapshots.map(s => Row(s.snapshotId, s.parentId.orNull,
      s.sequenceNumber, new java.sql.Timestamp(s.timestampMillis), s.operation,
      s.summary, s.manifestList))
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("parent_id", LongType),
        StructField("sequence_number", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = false),
        StructField("operation", StringType),
        StructField("summary", MapType(StringType, StringType)),
        StructField("manifest_list", StringType))))
  }

  def history(t: IceTable): DataFrame = {
    val m = t.meta
    val ancestors = Iterator.iterate(m.currentSnapshot)(s =>
        s.flatMap(_.parentId).flatMap(m.snapshot))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
    val rows = m.snapshotLog.map(e => Row(
      new java.sql.Timestamp(e.timestampMillis), e.snapshotId,
      m.snapshot(e.snapshotId).flatMap(_.parentId).orNull,
      ancestors.contains(e.snapshotId)))
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("made_current_at", TimestampType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false),
        StructField("parent_id", LongType),
        StructField("is_current_ancestor", BooleanType, nullable = false))))
  }

  def manifests(t: IceTable): DataFrame = {
    val m = t.meta
    val mfs = m.currentSnapshot.map(t.readManifestList(m, _)).getOrElse(Nil)
    manifestsDF(t, mfs)
  }

  def allManifests(t: IceTable): DataFrame = {
    val m = t.meta
    val mfs = m.snapshots.flatMap(s =>
      try t.readManifestList(m, s) catch { case _: Exception => Nil })
      .distinctBy(_.path)
    manifestsDF(t, mfs)
  }

  private def manifestsDF(t: IceTable, mfs: Seq[ManifestFileMeta]): DataFrame = {
    val rows = mfs.map(f => Row(f.path, f.length, f.specId, f.addedSnapshotId,
      f.addedFilesCount, f.existingFilesCount, f.deletedFilesCount,
      f.addedRowsCount, f.existingRowsCount, f.deletedRowsCount))
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("length", LongType, nullable = false),
        StructField("partition_spec_id", IntegerType, nullable = false),
        StructField("added_snapshot_id", LongType, nullable = false),
        StructField("added_data_files_count", IntegerType, nullable = false),
        StructField("existing_data_files_count", IntegerType, nullable = false),
        StructField("deleted_data_files_count", IntegerType, nullable = false),
        StructField("added_rows_count", LongType, nullable = false),
        StructField("existing_rows_count", LongType, nullable = false),
        StructField("deleted_rows_count", LongType, nullable = false))))
  }

  def entries(t: IceTable): DataFrame = entriesDF(t, allSnapshots = false)
  def allEntries(t: IceTable): DataFrame = entriesDF(t, allSnapshots = true)
  def files(t: IceTable): DataFrame =
    entriesDF(t, allSnapshots = false).filter("status != 2")
  def allFiles(t: IceTable): DataFrame =
    entriesDF(t, allSnapshots = true).filter("status != 2")

  /** Past this many manifests the entry rows are produced on EXECUTORS
    * (paths parallelized, manifests read per-partition) — the driver never
    * holds the per-file rows, so `files`/`entries` stay queryable on tables
    * whose metadata itself is big data. Below it, a driver pool read skips
    * the Spark-job overhead for interactive use. */
  private val DistributedEntriesThreshold = 16

  private def entryRow(e: ManifestEntry, specById: Int => graft.meta.PartitionSpec)
      : MetadataEntryRow = {
    val f = e.dataFile
    val partStr = specById(f.specId).fields.zip(f.partition)
      .map { case (pf, v) => s"${pf.name}=${String.valueOf(v)}" }.mkString("/")
    MetadataEntryRow(e.status, e.snapshotId, e.sequenceNumber, f.path, f.format,
      f.specId, partStr, f.recordCount, f.fileSizeBytes,
      f.valueCounts, f.nullCounts,
      f.lowerBounds.map { case (k, v) => (k, String.valueOf(v)) },
      f.upperBounds.map { case (k, v) => (k, String.valueOf(v)) })
  }

  private def entriesDF(t: IceTable, allSnapshots: Boolean): DataFrame = {
    val m = t.meta
    val spark = t.spark
    import spark.implicits._
    val snaps = if (allSnapshots) m.snapshots else m.currentSnapshot.toSeq
    val mfs = snaps.flatMap(s =>
      try t.readManifestList(m, s) catch { case _: Exception => Nil })
      .distinctBy(_.path)
    val ds: org.apache.spark.sql.Dataset[MetadataEntryRow] =
      if (mfs.size <= DistributedEntriesThreshold) {
        val es = ManifestIO.readAll(t.io, mfs, m.schema, m.specById).flatMap(_._2)
        spark.createDataset(es.map(entryRow(_, m.specById)))
      } else {
        val confB = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration))
        val schemaB = spark.sparkContext.broadcast(m.schema)
        val specsB = spark.sparkContext.broadcast(m.specs)
        val enc = t.io.encryption // encrypted manifests need the table's manager
        // the driver's forged-plaintext latch must cross the boundary too:
        // a reconstructed executor FileIO with a fresh (false) latch would
        // accept a forged plaintext manifest that the driver refuses
        val sealReq = t.io.requireSealedMetadata
        val nPart = math.max(1,
          math.min(mfs.size, spark.sparkContext.defaultParallelism))
        spark.createDataset(mfs.map(_.path)).repartition(nPart)
          .mapPartitions { it =>
            val io = new FileIO(confB.value.value, enc, sealReq)
            val specById = specsB.value.map(s => s.specId -> s).toMap
            it.flatMap { p =>
              // unreadable manifests are skipped for diagnostic robustness
              // on ordinary tables, but NOT when the table requires sealed
              // metadata: there a refused (forged-plaintext) manifest must
              // fail loudly, not silently hide its entries
              try ManifestIO.read(io, p, schemaB.value, specById(_))
                .map(entryRow(_, specById(_))).iterator
              catch { case _: Exception if !sealReq => Iterator.empty }
            }
          }
      }
    val all = ds.toDF("status", "snapshot_id", "sequence_number", "file_path",
      "file_format", "spec_id", "partition", "record_count",
      "file_size_in_bytes", "value_counts", "null_value_counts",
      "lower_bounds", "upper_bounds")
    if (allSnapshots) all else all.filter(col("status") =!= EntryStatus.Deleted)
  }

  /** Per-partition record/file counts (ref `PartitionsTable.java:74-96`). */
  def partitions(t: IceTable): DataFrame = {
    import org.apache.spark.sql.functions._
    files(t).groupBy("partition")
      .agg(sum("record_count").as("record_count"), count(lit(1)).as("file_count"))
      .orderBy("partition")
  }

  /** Branches and tags, main included (ref-era tables lack this; modeled on
    * the published format spec's `refs`). */
  def refsTable(t: IceTable): DataFrame = {
    val m = t.meta
    val mainRow = m.currentSnapshotId.map(id => Row(
      SnapshotRefMeta.MainBranch, SnapshotRefMeta.Branch, id,
      null, null, null)).toSeq
    val rows = mainRow ++ m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      Row(n, r.refType, r.snapshotId,
        r.maxRefAgeMs.orNull, r.maxSnapshotAgeMs.orNull,
        r.minSnapshotsToKeep.orNull)
    }
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("type", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false),
        StructField("max_reference_age_in_ms", LongType),
        StructField("max_snapshot_age_in_ms", LongType),
        StructField("min_snapshots_to_keep", IntegerType))))
  }

  /** The metadata-file history (ref `MetadataLogEntriesTable` shape): one
    * row per previous metadata version, with the snapshot that was current
    * when it was written. */
  def metadataLogEntries(t: IceTable): DataFrame = {
    val m = t.meta
    val rows = m.metadataLog.map { e =>
      val snapAtTime = m.snapshotLog.filter(_.timestampMillis <= e.timestampMillis)
        .lastOption.map(_.snapshotId)
      Row(new java.sql.Timestamp(e.timestampMillis), e.file, snapAtTime.orNull)
    }
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("timestamp", TimestampType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("latest_snapshot_id", LongType))))
  }

  def apply(t: IceTable, name: String): DataFrame = name.toLowerCase match {
    case "snapshots" => snapshots(t)
    case "refs" => refsTable(t)
    case "metadata_log_entries" => metadataLogEntries(t)
    case "history" => history(t)
    case "manifests" => manifests(t)
    case "all_manifests" => allManifests(t)
    case "entries" => entries(t)
    case "all_entries" => allEntries(t)
    case "files" | "data_files" => files(t)
    case "all_data_files" | "all_files" => allFiles(t)
    case "partitions" => partitions(t)
    case "statistics" => statistics(t)
    case "position_deletes" => positionDeletes(t)
    case other => throw new IllegalArgumentException(s"Unknown metadata table: $other")
  }

  /** Live position-delete content, one row per deleted position (later-ref
    * `PositionDeletesTable`): the deleted data file + ordinal, plus the
    * delete file that holds the tombstone and its partition scope. The
    * delete parquet files are read as ONE distributed scan (delete metadata
    * at 100 TB is itself big data); scope columns join in from the
    * broadcast-sized delete-file metas. */
  def positionDeletes(t: IceTable): DataFrame = {
    import org.apache.spark.sql.functions._
    val all = t.newScan().planDeletes().map(_._1)
    val deletes = all.filter(_.content == FileContent.PositionDeletes)
    val dvs = all.filter(_.content == FileContent.DeletionVectors)
    val spark = t.spark
    val schema = StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("partition", StringType),
      StructField("spec_id", IntegerType),
      StructField("delete_file_path", StringType, nullable = false)))
    if (deletes.isEmpty && dvs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val specById: Int => graft.meta.PartitionSpec = t.meta.specById
    def scopeOf(f: DataFileMeta): (String, String, Int) = {
      val partStr = specById(f.specId).fields.zip(f.partition)
        .map { case (pf, v) => s"${pf.name}=${String.valueOf(v)}" }.mkString("/")
      (f.path, if (partStr.isEmpty) null else partStr, f.specId)
    }
    def scopeDfOf(fs: Seq[DataFileMeta]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        fs.map(scopeOf).map { case (p, s, i) =>
          org.apache.spark.sql.Row(p, s, i) }.toList, 1),
      StructType(Seq(
        StructField("delete_file_path", StringType, nullable = false),
        StructField("partition", StringType),
        StructField("spec_id", IntegerType))))
    val fromParquet = if (deletes.isEmpty) None else Some(spark.read
      .options(EncryptionManagers.contentOptionsFor(t.io.encryption, "parquet",
        t.meta.property(TableProperties.EncryptionRequired, "false").toBoolean))
      .parquet(deletes.map(_.path): _*)
      .select(col(MergeOnRead.PosPathCol).cast("string").as("file_path"),
        col(MergeOnRead.PosPosCol).cast("long").as("pos"),
        col("_metadata.file_path").as("_del_raw"))
      // listing paths ("file:/p") and _metadata paths ("file:///p") differ
      // in slash count; normalize through the same rule the probe uses
      .withColumn("_del_norm",
        regexp_replace(col("_del_raw"), "^file:/+", "file:/"))
      .drop("_del_raw")
      .join(broadcast(scopeDfOf(deletes).withColumn("_del_norm",
        regexp_replace(col("delete_file_path"), "^file:/+", "file:/"))),
        Seq("_del_norm"), "left")
      .select("file_path", "pos", "partition", "spec_id", "delete_file_path"))
    // deletion vectors expand to the same row shape; scope is per BLOB
    // (several blobs share a sidecar but target different partitions), so
    // the scope rows key by the referenced data file instead of the path
    val fromDvs = if (dvs.isEmpty) None else {
      val dvScope = spark.createDataFrame(
        spark.sparkContext.parallelize(dvs.map { f =>
          val (_, partStr, specId) = scopeOf(f)
          org.apache.spark.sql.Row(f.referencedFile.getOrElse(""), partStr,
            specId, f.path)
        }.toList, 1),
        StructType(Seq(
          StructField("file_path", StringType, nullable = false),
          StructField("partition", StringType),
          StructField("spec_id", IntegerType),
          StructField("delete_file_path", StringType, nullable = false))))
      // join on (referenced file, sidecar): one file can carry blobs in
      // SEVERAL sidecars (deletes accumulated across commits) and a
      // file-only join would cross-multiply their scope rows
      Some(DeletionVectors.positionsDf(t, dvs)
        .select(col(MergeOnRead.PosPathCol).as("file_path"),
          col(MergeOnRead.PosPosCol).as("pos"),
          col("_gf_dv_path").as("delete_file_path"))
        .join(broadcast(dvScope.dropDuplicates("file_path", "delete_file_path")),
          Seq("file_path", "delete_file_path"), "left")
        .select("file_path", "pos", "partition", "spec_id", "delete_file_path"))
    }
    (fromParquet ++ fromDvs).reduce(_ unionByName _)
  }

  /** ANALYZE output, one row per profiled column per stats file (the
    * published spec's `statistics` metadata table, flattened). */
  def statistics(t: IceTable): DataFrame = {
    val m = t.meta
    val schema = m.schema
    val rows = m.statsFiles.flatMap { f =>
      val (rowCount, stats) = TableStats.read(t.io, f.path)
      stats.map(s => Row(f.snapshotId, f.path, f.fileSizeBytes, rowCount,
        s.fieldId, schema.idToName.get(s.fieldId).orNull, s.distinctCount,
        s.nullCount, s.avgLen.map(Long.box).orNull, s.maxLen.map(Long.box).orNull))
    }
    t.spark.createDataFrame(
      t.spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("statistics_path", StringType, nullable = false),
        StructField("file_size_in_bytes", LongType, nullable = false),
        StructField("row_count", LongType, nullable = false),
        StructField("field_id", IntegerType, nullable = false),
        StructField("column_name", StringType),
        StructField("distinct_count", LongType, nullable = false),
        StructField("null_count", LongType, nullable = false),
        StructField("avg_len", LongType),
        StructField("max_len", LongType))))
  }
}
