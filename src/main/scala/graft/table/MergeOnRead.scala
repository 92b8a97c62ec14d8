package graft.table

import java.util.UUID

import graft.meta.model._

import org.apache.spark.sql.DataFrame
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
  * Writes are `newRowDelta()`-style commits: delete files are ADDED, no data
  * file is rewritten — O(changed rows), not O(affected files).
  */
object MergeOnRead {

  val PosPathCol = "file_path"
  val PosPosCol = "pos"

  /** Commit an equality-delete file: rows of `keys` values to suppress. */
  def addEqualityDeletes(table: IceTable, keysDf: DataFrame, keys: Seq[String]): Unit = {
    val m = table.meta
    val schema = m.schema
    val ids = keys.map(schema.fieldId)
    val outDir = s"${table.location}/data/deletes-${UUID.randomUUID()}"
    keysDf.select(keys.map(col): _*).dropDuplicates(keys).write.parquet(outDir)
    val files = deleteFileMetas(table, m, outDir, FileContent.EqualityDeletes, ids)
    table.commitSnapshot(Operation.Delete, files, Set.empty,
      Map("equality-delete-files" -> files.size.toString))
  }

  /** Commit a position-delete file: (file_path, pos) rows to suppress. */
  def addPositionDeletes(table: IceTable, posDf: DataFrame): Unit = {
    val m = table.meta
    val outDir = s"${table.location}/data/deletes-${UUID.randomUUID()}"
    posDf.select(col(PosPathCol).cast("string"), col(PosPosCol).cast("long"))
      .dropDuplicates(PosPathCol, PosPosCol).write.parquet(outDir)
    val files = deleteFileMetas(table, m, outDir, FileContent.PositionDeletes, Nil)
      .filter(_.recordCount > 0)
    if (files.isEmpty) return // nothing matched: no-op, no empty snapshot
    table.commitSnapshot(Operation.Delete, files, Set.empty,
      Map("position-delete-files" -> files.size.toString))
  }

  /** Merge-on-read DELETE WHERE: record matching row positions as a position
    * delete file (one job over the pruned scan; no data rewrite). */
  def deleteWhere(table: IceTable, filter: graft.meta.expr.Expr): Unit = {
    val positions = table.newScan().filter(filter).withRowPositions().toDF
      .filter(graft.meta.expr.SparkConv.toColumn(
        graft.meta.expr.Binder.bind(table.schema, filter), table.schema) <=> lit(true))
      .select(col(TableScan.MetaFileCol).as(PosPathCol),
        col(TableScan.MetaPosCol).as(PosPosCol))
    addPositionDeletes(table, positions)
  }

  private def deleteFileMetas(table: IceTable, m: TableMetadata, outDir: String,
      content: Int, equalityIds: Seq[Int]): Seq[DataFileMeta] = {
    table.io.listRecursive(outDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val conf = table.spark.sparkContext.hadoopConfiguration
        val rc = ParquetMetrics.read(conf, st.getPath.toString, m.schema).recordCount
        DataFileMeta(
          path = st.getPath.toString, format = "parquet",
          specId = m.defaultSpecId,
          partition = m.spec.fields.map(_ => null), // global scope
          recordCount = rc, fileSizeBytes = st.getLen,
          schemaId = m.currentSchemaId, content = content,
          equalityIds = equalityIds)
      }
  }

  /** Apply the given (already applicability-filtered) delete files to a data
    * DataFrame that carries meta columns when position deletes are present. */
  private[table] def applyDeletes(spark: org.apache.spark.sql.SparkSession,
      m: TableMetadata, df: DataFrame, applicable: Seq[DataFileMeta]): DataFrame = {
    var out = df
    val posFiles = applicable.filter(_.content == FileContent.PositionDeletes)
    if (posFiles.nonEmpty) {
      val pos = spark.read.parquet(posFiles.map(_.path): _*)
        .select(col(PosPathCol), col(PosPosCol))
      out = out.join(broadcastIfSmall(pos, posFiles),
        out(TableScan.MetaFileCol) === pos(PosPathCol) &&
          out(TableScan.MetaPosCol) === pos(PosPosCol),
        "left_anti")
    }
    val eqFiles = applicable.filter(_.content == FileContent.EqualityDeletes)
    eqFiles.groupBy(_.equalityIds).foreach { case (ids, fs) =>
      val keyNames = ids.map(m.schema.fieldName)
      val keys = spark.read.parquet(fs.map(_.path): _*).select(keyNames.map(col): _*)
      out = out.join(broadcastIfSmall(keys, fs), keyNames, "left_anti")
    }
    out
  }

  private def broadcastIfSmall(df: DataFrame, files: Seq[DataFileMeta]): DataFrame =
    if (files.map(_.fileSizeBytes).sum < 64L * 1024 * 1024) broadcast(df) else df
}
