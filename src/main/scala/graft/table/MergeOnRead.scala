package graft.table

import java.util.UUID

import graft.meta.model._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Merge-on-read row deletes via delete FILES (format v2; ref
  * `core/.../deletes/EqualityDeleteWriter.java`, `PositionDeleteWriter.java`,
  * read side `data/.../DeleteFilter.java:111`, matching rules
  * `core/.../DeleteFileIndex.java:103`):
  *
  *  - equality deletes: a parquet file of key tuples; applies to data files
  *    with sequenceNumber < delete's sequenceNumber (anti join on keys)
  *  - position deletes: a parquet file of (file_path, pos); applies to data
  *    files with sequenceNumber ≤ delete's (anti join on Spark's
  *    `_metadata.file_path/row_index`)
  *
  * Delete files are PARTITION-SCOPED when the write can prove scope (ref
  * `DeleteFileIndex.java:286` partition matching): equality deletes whose
  * keys cover every partition-source column are split per partition (a row
  * with those key values can only live in that partition, so scoping is
  * semantically neutral); position deletes inherit the partition of their
  * target data file. An all-null partition tuple means GLOBAL scope —
  * conservative and always sound. Scoped deletes let a scan group skip
  * delete files for other partitions entirely, so a table with K delete
  * files doesn't anti-join all K on every read.
  *
  * Writes are `newRowDelta()`-style commits: delete files are ADDED, no data
  * file is rewritten — O(changed rows), not O(affected files).
  */
object MergeOnRead {

  val PosPathCol = "file_path"
  val PosPosCol = "pos"

  /** Commit an equality-delete file: rows of `keys` values to suppress.
    * Partition-scoped per delete row when `keys` cover all partition
    * sources; global otherwise. */
  def addEqualityDeletes(table: IceTable, keysDf: DataFrame, keys: Seq[String]): Unit = {
    val files = writeEqualityDeleteFiles(table, table.meta, keysDf, keys)
    if (files.isEmpty) return // no key tuples: no-op, no empty snapshot
    table.commitSnapshot(Operation.Delete, files, Set.empty,
      Map("equality-delete-files" -> files.size.toString))
  }

  /** Write (but do NOT commit) equality-delete files for `keysDf`'s key
    * tuples — the building block the streaming upsert sink combines with a
    * data append in ONE snapshot (ref `EqualityDeleteWriter.java` used by
    * the Flink CDC writer). */
  /** Delete files are always parquet: a non-plaintext manager that cannot
    * drive Parquet Modular Encryption (stream-only, not
    * [[KeyedFileEncryption]]) would silently write equality-delete key
    * VALUES and position paths plaintext into an encrypted table — refuse,
    * mirroring `Writes.writeDataFiles`' stream-only-on-parquet refusal. */
  private def requireDeleteFilesEncryptable(table: IceTable): Unit = {
    val e = table.io.encryption
    if (e != PlaintextEncryptionManager && !e.isInstanceOf[KeyedFileEncryption])
      throw new ValidationException(
        s"${table.location}: delete files are written as parquet, but " +
          s"encryption manager ${e.getClass.getSimpleName} is stream-only " +
          "— it cannot drive Parquet Modular Encryption, and writing " +
          "plaintext delete content into an encrypted table is refused")
  }

  private[graft] def writeEqualityDeleteFiles(table: IceTable, m: TableMetadata,
      keysDf: DataFrame, keys: Seq[String]): Seq[DataFileMeta] = {
    Writes.requireEncryptionSatisfied(table, m)
    requireDeleteFilesEncryptable(table)
    val schema = m.schema
    val spec = m.spec
    val ids = keys.map(schema.fieldId)
    val outDir = Locations.newWriteDir(table.location, m, s"deletes-${UUID.randomUUID()}")
    val distinctKeys = keysDf.select(keys.map(col): _*).dropDuplicates(keys)
    val scoped = spec.isPartitioned &&
      spec.fields.forall(pf => ids.contains(pf.sourceId))
    if (scoped) {
      // derive the partition tuple from the key values with the same
      // codegen'd transform expressions the data writer uses
      val helperNames = spec.fields.map(pf => Writes.HelperPrefix + pf.name)
      val helperCols = spec.fields.map { pf =>
        val srcName = schema.fieldName(pf.sourceId)
        pf.transform.toColumn(col(srcName), schema.fieldType(pf.sourceId))
      }
      // key VALUES are row data: encrypted tables encrypt their equality
      // deletes too (keyed managers → Parquet Modular Encryption)
      distinctKeys.withColumns(helperNames.zip(helperCols).toMap)
        .write.option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .options(EncryptionManagers.parquetCryptoOptions(table.io.encryption))
        .partitionBy(helperNames: _*).parquet(outDir)
    } else {
      distinctKeys.write.option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .options(EncryptionManagers.parquetCryptoOptions(table.io.encryption))
        .parquet(outDir)
    }
    val metas = deleteFileMetas(table, m, outDir, FileContent.EqualityDeletes, ids,
      scoped = scoped)
      .filter(_.recordCount > 0)
    if (metas.isEmpty) table.io.deleteRecursive(outDir) // no orphan empties
    metas
  }

  /** ONE-snapshot keyed upsert delta (ref Flink CDC writer semantics): an
    * equality-delete file of `rows`' key tuples plus the appended rows,
    * committed together. Both carry the SAME sequence number, and equality
    * deletes apply only to STRICTLY earlier sequences — so the delta's own
    * rows survive while every older row with a matching key is suppressed.
    * No target data file is read or rewritten. */
  private[graft] def upsertDelta(table: IceTable, keys: Seq[String],
      rows: DataFrame, extraSummary: Map[String, String] = Map.empty): Unit = {
    val m = table.meta
    val eqFiles = writeEqualityDeleteFiles(table, m,
      rows.select(keys.map(col): _*), keys)
    val dataFiles = Writes.writeDataFiles(table.spark, table, m, rows)
      .filter(_.recordCount > 0)
    table.commitSnapshot(Operation.Overwrite, eqFiles ++ dataFiles, Set.empty,
      extraSummary ++ Map(
        "equality-delete-files" -> eqFiles.size.toString,
        "upserted-data-files" -> dataFiles.size.toString))
  }

  /** Equality-delete keys + replacement rows committed in ONE snapshot,
    * where the delete keys need NOT appear among the rows ([[upsertDelta]]
    * derives its keys FROM the rows) — the index-maintenance shape: drop
    * every stale row of the changed keys (deleted keys included), append
    * the fresh ones, strictly-older-sequence semantics keeping the commit
    * idempotent under replay (a rerun's eq delete kills the prior
    * attempt's appended rows before re-appending). */
  private[graft] def deleteAndAppend(table: IceTable, keys: Seq[String],
      keysDf: DataFrame, rows: DataFrame,
      extraSummary: Map[String, String] = Map.empty): Unit = {
    val m = table.meta
    val eqFiles = writeEqualityDeleteFiles(table, m, keysDf, keys)
    val dataFiles = Writes.writeDataFiles(table.spark, table, m, rows)
      .filter(_.recordCount > 0)
    if (eqFiles.isEmpty && dataFiles.isEmpty) return
    table.commitSnapshot(Operation.Overwrite, eqFiles ++ dataFiles, Set.empty,
      extraSummary ++ Map(
        "equality-delete-files" -> eqFiles.size.toString,
        "upserted-data-files" -> dataFiles.size.toString))
  }

  /** Commit a position-delete file: (file_path, pos) rows to suppress. */
  def addPositionDeletes(table: IceTable, posDf: DataFrame): Unit = {
    val (files, _) = writePositionDeleteFiles(table, table.meta, posDf)
    if (files.isEmpty) return // nothing matched: no-op, no empty snapshot
    table.commitSnapshot(Operation.Delete, files, Set.empty,
      Map("position-delete-files" -> files.size.toString))
  }

  /** Write (but do NOT commit) position-delete files for `posDf`'s
    * (file_path, pos) rows. Each delete row is scoped to the partition of
    * its target data file (looked up from scan metadata, broadcast);
    * unknown paths fall back to global scope.
    *
    * Returns (delete-file metas, data-file paths the delete rows reference).
    * Callers put the referenced paths — NOT their whole planned task set —
    * into `requiredLivePaths`, so a concurrent rewrite of an untouched file
    * never spuriously aborts the commit (ref validates only
    * delete-referenced files). When nothing matched, the written directory
    * is removed again — no orphan empty parquet for maintenance to sweep.
    *
    * `affected`: the data files whose positions can appear in `posDf` —
    * callers that planned a scan pass their task set so the partition
    * lookup stays affected-file-sized instead of broadcasting every live
    * file in the table (at millions of files the full lookup is a
    * needlessly large broadcast). `None` (public addPositionDeletes, where
    * posDf is arbitrary) falls back to all live files.
    *
    * `compact`: one exchange on the partition value before the write, so
    * each partition emits exactly ONE delete file (the
    * rewritePositionDeleteFiles contract); DML writes skip it — their
    * delete sets are small and an extra shuffle per commit isn't worth it.
    * `wantRefs = false` skips the referenced-path read-back job for callers
    * that discard the set. */
  private[table] def writePositionDeleteFiles(table: IceTable, m: TableMetadata,
      posDf: DataFrame,
      affected: Option[Seq[FileScanTask]] = None,
      compact: Boolean = false,
      wantRefs: Boolean = true): (Seq[DataFileMeta], Set[String]) = {
    // deletion-vector mode: same inputs, bitmap sidecars out — every DML
    // caller (DELETE/UPDATE/MERGE merge-on-read, streaming upsert compose,
    // rewrite/convert maintenance) switches representation with the table
    // property, no call-site changes. The writer returns referenced paths
    // from its blob descriptors, so `wantRefs` costs no extra job here.
    if (m.property(TableProperties.DeleteVectors, "false").toBoolean)
      return DeletionVectors.writeSidecars(table, m, posDf, affected)
    Writes.requireEncryptionSatisfied(table, m)
    requireDeleteFilesEncryptable(table)
    val spec = m.spec
    val outDir = Locations.newWriteDir(table.location, m, s"deletes-${UUID.randomUUID()}")
    val rows0 = posDf.select(col(PosPathCol).cast("string"), col(PosPosCol).cast("long"))
      .dropDuplicates(PosPathCol, PosPosCol)
    val rows = if (compact && !spec.isPartitioned) rows0.coalesce(1) else rows0
    val scoped = spec.isPartitioned
    if (scoped) {
      // path -> stringified partition tuple of the live default-spec files;
      // files under other specs (or unknown paths) stay global (all-marker)
      val schema = m.schema
      val spark = table.spark
      val helperNames = spec.fields.map(pf => Writes.HelperPrefix + pf.name)
      val lookupRows = affected.getOrElse(table.newScan().planFiles())
        .filter(_.file.specId == spec.specId)
        .map { t =>
          val parts = spec.fields.zipWithIndex.map { case (pf, i) =>
            partValueToString(t.file.partition(i), spec.fieldType(schema, pf))
          }
          org.apache.spark.sql.Row.fromSeq(table.normPath(t.file.path) +: parts)
        }
      val lookupSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_gp_path",
          org.apache.spark.sql.types.StringType) +:
        helperNames.map(n => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
      // local rows -> LocalRelation (metadata-sized; broadcast-friendly,
      // no single-partition RDD job)
      val lookup = spark.createDataFrame(
        java.util.Arrays.asList(lookupRows: _*), lookupSchema)
      // normalize URI schemes: _metadata.file_path is "file:///p", Hadoop
      // listings are "file:/p", lookup keys are scheme-less normPath
      val joined = rows.join(broadcast(lookup),
          normPathCol(rows(PosPathCol)) === lookup("_gp_path"), "left")
        .drop("_gp_path")
      val filled = helperNames.foldLeft(joined)((df, n) =>
        df.withColumn(n, coalesce(col(n),
          lit(ExternalCatalogUtils.DEFAULT_PARTITION_NAME))))
      // compact: hash-exchange on the partition tuple puts every row of one
      // partition in one task → exactly one file per partition dir
      val out = if (compact) filled.repartition(helperNames.map(col): _*) else filled
      out.write.option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .options(EncryptionManagers.parquetCryptoOptions(table.io.encryption))
        .partitionBy(helperNames: _*).parquet(outDir)
    } else {
      rows.write.option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .options(EncryptionManagers.parquetCryptoOptions(table.io.encryption))
        .parquet(outDir)
    }
    val metas = deleteFileMetas(table, m, outDir, FileContent.PositionDeletes, Nil,
      scoped = scoped)
      .filter(_.recordCount > 0)
    if (metas.isEmpty) {
      table.io.deleteRecursive(outDir) // nothing matched: no orphan files
      (Nil, Set.empty)
    } else if (!wantRefs) {
      (metas, Set.empty)
    } else {
      // distinct referenced targets, read back from the (small) delete files
      val referenced = table.spark.read
        .options(EncryptionManagers.contentOptionsFor(table.io.encryption,
          "parquet", m.property(TableProperties.EncryptionRequired, "false").toBoolean))
        .parquet(metas.map(_.path): _*)
        .select(PosPathCol).distinct().collect().map(_.getString(0)).toSet
      (metas, referenced)
    }
  }

  /** Merge-on-read DELETE WHERE (ref TableProperties DELETE_MODE
    * merge-on-read): strictly-matching WHOLE files drop metadata-only —
    * same fast path as copy-on-write — and only partially-matching files
    * get position-delete rows, all in ONE snapshot. `rowCond` carries a
    * condition the predicate ADT can't express; `filter` is then only a
    * pruning bound and the metadata-only path is disabled. */
  def deleteWhere(table: IceTable, filter: graft.meta.expr.Expr,
      rowCond: Option[org.apache.spark.sql.Column] = None): Unit = {
    import graft.meta.expr._
    val m = table.meta
    val schema = m.schema
    val bound = Binder.bind(schema, filter)
    val tasks = table.newScan().filter(filter).planFiles()
    if (tasks.isEmpty) return
    val (whole, partial) =
      if (rowCond.nonEmpty) (Nil, tasks)
      else RowOps.strictPartition(m, bound, tasks)
    val (posFiles, refPaths) =
      if (partial.isEmpty) (Nil, Set.empty[String])
      else {
        val df = Reads.readTasksWithDeletes(table, m,
          partial.map(_.copy(residual = TrueExpr)),
          table.newScan().planDeletes(), schema.columnNames, TrueExpr,
          rowPositions = true)
        val cond = rowCond.getOrElse(SparkConv.toColumn(bound, schema))
        val positions = df.filter(cond <=> lit(true))
          .select(col(TableScan.MetaFileCol).as(PosPathCol),
            col(TableScan.MetaPosCol).as(PosPosCol))
        writePositionDeleteFiles(table, m, positions, affected = Some(partial))
      }
    if (whole.isEmpty && posFiles.isEmpty) return
    table.commitSnapshot(Operation.Delete, posFiles,
      whole.map(_.file.path).toSet,
      Map("position-delete-files" -> posFiles.size.toString,
        "metadata-only-deleted-files" -> whole.size.toString),
      validate = Some(ConflictValidation(m.currentSnapshotId, filter,
        m.property(TableProperties.DeleteIsolationLevel,
          TableProperties.IsolationSerializable),
        // a concurrent rewrite of a referenced file would orphan the
        // position deletes — the commit must see those files still live
        // (only the files the deletes actually reference, not every
        // planned file)
        requiredLivePaths = refPaths)),
      removedMeta = whole.map(_.file))
  }

  /** Merge-on-read UPDATE SET (ref TableProperties UPDATE_MODE
    * merge-on-read): matching rows become position-delete entries AND their
    * updated copies are appended — one snapshot, O(changed rows) IO instead
    * of rewriting whole files. */
  def updateWhere(table: IceTable, filter: graft.meta.expr.Expr,
      assignments: Map[String, org.apache.spark.sql.Column],
      rowCond: Option[org.apache.spark.sql.Column] = None): Unit = {
    import graft.meta.expr._
    val m = table.meta
    val schema = m.schema
    val bound = Binder.bind(schema, filter)
    val tasks = table.newScan().filter(filter).planFiles()
    if (tasks.isEmpty) return
    // preserving update (row lineage): the appended updated copies carry
    // their ORIGINAL _row_id (materialized) and a NULL materialized seq —
    // the implicit fallback then reports THIS commit's sequence, which is
    // exactly "last updated now"
    val preserve = Writes.lineagePreserve(m)
    val df = Reads.readTasksWithDeletes(table, m,
      tasks.map(_.copy(residual = TrueExpr)),
      table.newScan().planDeletes(), schema.columnNames, TrueExpr,
      rowPositions = true, withLineage = preserve)
    val cond = rowCond.getOrElse(SparkConv.toColumn(bound, schema))
    val matching = df.filter(cond <=> lit(true)).cache()
    try {
      val (posFiles, refPaths) = writePositionDeleteFiles(table, m, matching
        .select(col(TableScan.MetaFileCol).as(PosPathCol),
          col(TableScan.MetaPosCol).as(PosPosCol)), affected = Some(tasks))
      if (posFiles.isEmpty) return // no matching rows anywhere
      val updated =
        if (!preserve) RowOps.applyAssignments(schema, matching, assignments,
          lit(true))
        else RowOps.applyAssignments(schema,
          matching.withColumn("_gf_last_seq",
            lit(null).cast("long")),
          assignments, lit(true), keepCols = Seq("_gf_row_id", "_gf_last_seq"))
      val dataFiles = Writes.writeDataFiles(table.spark, table, m, updated,
          lineageCols = preserve)
        .filter(_.recordCount > 0)
      table.commitSnapshot(Operation.Overwrite, posFiles ++ dataFiles, Set.empty,
        Map("position-delete-files" -> posFiles.size.toString,
          "updated-data-files" -> dataFiles.size.toString),
        validate = Some(ConflictValidation(m.currentSnapshotId, filter,
          m.property(TableProperties.UpdateIsolationLevel,
            TableProperties.IsolationSerializable),
          requiredLivePaths = refPaths)))
    } finally matching.unpersist()
  }

  /** Inverse of `Writes.parsePartitionValue` for internal-repr values. */
  private[table] def partValueToString(v: Any,
      t: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    if (v == null) return ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    t match {
      case DateType => java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong).toString
      case TimestampType | TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString
      case _: DecimalType => v.asInstanceOf[java.math.BigDecimal].toPlainString
      case _ => v.toString
    }
  }

  private def deleteFileMetas(table: IceTable, m: TableMetadata, outDir: String,
      content: Int, equalityIds: Seq[Int], scoped: Boolean): Seq[DataFileMeta] = {
    val spec = m.spec
    val schema = m.schema
    table.io.listRecursive(outDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val path = st.getPath.toString
        val conf = EncryptionManagers.parquetCryptoConf(
          table.spark.sparkContext.hadoopConfiguration,
          Some(table.io.encryption))
        val rc = ParquetMetrics.read(conf, path, m.schema).recordCount
        val partValues: Seq[Any] =
          if (!scoped || spec.isUnpartitioned) spec.fields.map(_ => null)
          else {
            val rel = path.stripPrefix(outDir).stripPrefix("/")
            val dirs = rel.split('/').dropRight(1).filter(_.contains('='))
              .map { seg =>
                val Array(k, v2) = seg.split("=", 2)
                k.stripPrefix(Writes.HelperPrefix) ->
                  ExternalCatalogUtils.unescapePathName(v2)
              }.toMap
            spec.fields.map { pf =>
              dirs.get(pf.name) match {
                case Some(ExternalCatalogUtils.DEFAULT_PARTITION_NAME) | None => null
                case Some(raw) =>
                  Writes.parsePartitionValue(raw, spec.fieldType(schema, pf))
              }
            }
          }
        DataFileMeta(
          path = path, format = "parquet",
          specId = m.defaultSpecId,
          partition = partValues,
          recordCount = rc, fileSizeBytes = st.getLen,
          schemaId = m.currentSchemaId, content = content,
          equalityIds = equalityIds,
          // delete files are encrypted like data files when the manager
          // drives parquet modular encryption: stamp the same derived key
          // slot so the plan-time wrong-key guard covers them too (a
          // stream-only manager never reaches here —
          // requireDeleteFilesEncryptable refuses it up front)
          keyMetadata = table.io.encryption match {
            case k: KeyedFileEncryption => k.keyMetadata(path)
            case _ => None
          })
      }
  }

  /** A delete file's applicability to one data file (ref
    * `DeleteFileIndex.java:103,286`): sequence rule per content type, then
    * partition scope — all-null partition = global; a different spec can't
    * prove disjointness, so scoped deletes still apply across specs. */
  /** Sequence rule alone (partition scope ignored) — used when branch-count
    * capping merges applicability classes; see `IceTable.MaxDeleteGroups`. */
  private[table] def seqApplies(d: DataFileMeta, dseq: Long, t: FileScanTask): Boolean =
    if (FileContent.isPositional(d.content)) dseq >= t.seq
    else dseq > t.seq

  private[table] def applies(d: DataFileMeta, dseq: Long, t: FileScanTask): Boolean = {
    if (!seqApplies(d, dseq, t)) return false
    val global = d.partition.isEmpty || d.partition.forall(_ == null)
    global || d.specId != t.file.specId || d.partition == t.file.partition
  }

  /** Apply the given (already applicability-filtered) delete files to a data
    * DataFrame that carries meta columns when position deletes are present.
    * `groupPaths` (the data files behind `df`) prefilters the position-delete
    * scan so the anti join probes only relevant rows. */
  private[table] def applyDeletes(spark: org.apache.spark.sql.SparkSession,
      m: TableMetadata, df: DataFrame, applicable: Seq[DataFileMeta],
      groupPaths: Seq[String] = Nil,
      readOptions: Map[String, String] = Map.empty,
      dvPositions: Seq[DataFileMeta] => DataFrame = null): DataFrame = {
    var out = df
    val posFiles = applicable.filter(_.content == FileContent.PositionDeletes)
    // deletion vectors targeting files outside this group never reach the
    // join at all — the metas carry the referenced path, no scan needed
    val dvFiles = applicable.filter(_.content == FileContent.DeletionVectors)
      .filter(d => groupPaths.isEmpty ||
        d.referencedFile.forall(groupPaths.contains))
    val posParquet = if (posFiles.isEmpty) None else {
      val pos0 = spark.read.options(readOptions)
        .parquet(posFiles.map(_.path): _*)
        .select(col(PosPathCol), col(PosPosCol))
      // pushes a filter into the delete-file scan: only rows targeting this
      // group's files survive, so the anti join probes a fraction of the
      // delete data (groupPaths are scheme-less normPaths)
      Some(if (groupPaths.nonEmpty && groupPaths.size <= 1000)
        pos0.filter(normPathCol(col(PosPathCol)).isin(groupPaths: _*))
      else pos0)
    }
    val dvRows = if (dvFiles.isEmpty) None
      else Some(dvPositions(dvFiles).select(col(PosPathCol), col(PosPosCol)))
    // both sides normalized: parquet delete rows store file_path verbatim
    // as captured (scheme-full), DV blobs store normalized referenced
    // paths — normPathCol is idempotent across both conventions
    (posParquet ++ dvRows).reduceOption(_ unionByName _).foreach { pos =>
      out = out.join(broadcastIfSmall(pos, posFiles ++ dvFiles),
        normPathCol(out(TableScan.MetaFileCol)) === normPathCol(pos(PosPathCol)) &&
          out(TableScan.MetaPosCol) === pos(PosPosCol),
        "left_anti")
    }
    val eqFiles = applicable.filter(_.content == FileContent.EqualityDeletes)
    eqFiles.groupBy(_.equalityIds).foreach { case (ids, fs) =>
      val keyNames = ids.map(m.schema.fieldName)
      val keys = spark.read.options(readOptions)
        .parquet(fs.map(_.path): _*).select(keyNames.map(col): _*)
      // null-safe equality per key column: delete rows with null keys match
      // target rows with nulls (ref equality-delete spec semantics)
      val kdf = broadcastIfSmall(keys, fs)
      val cond = keyNames.map(n => out(n) <=> kdf(n)).reduce(_ && _)
      out = out.join(kdf, cond, "left_anti")
    }
    out
  }

  private def broadcastIfSmall(df: DataFrame, files: Seq[DataFileMeta]): DataFrame =
    if (files.map(_.fileSizeBytes).sum < 64L * 1024 * 1024) broadcast(df) else df

  /** Strip the URI scheme from a path column (Column analogue of
    * `IceTable.normPath`). */
  private[table] def normPathCol(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9.+-]+:/+", "/")
}

