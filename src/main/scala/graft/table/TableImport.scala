package graft.table

import graft.meta.{PartitionSpec, Schema}
import graft.meta.model.{DataFileMeta, Operation, TableProperties}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.types.StructType

/** Imports existing parquet data as a graft table WITHOUT rewriting files
  * (ref `spark/.../SparkTableUtil.java:117` importSparkTable /
  * `AddFilesProcedure` / migrate): list files, read footers for metrics,
  * register. Hive-layout partition dirs become identity partition fields;
  * since imported files don't contain the partition columns, the table is
  * marked for read-time partition-constant injection
  * (ref `PartitionUtil.constantsMap`).
  */
object TableImport {

  /** Snapshot an existing parquet directory (flat or hive-partitioned) into
    * a new graft table at `location`. */
  def importParquet(spark: SparkSession, sourceDir: String, location: String,
      properties: Map[String, String] = Map.empty): IceTable = {
    val df = spark.read.parquet(sourceDir)
    val fullSchema = Schema.fresh(df.schema) // includes discovered partition cols
    val io = new FileIO(spark.sparkContext.hadoopConfiguration)
    val files = io.listRecursive(sourceDir)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"No parquet files under $sourceDir")

    // hive-layout partition columns from the first file's relative path
    val partCols: Seq[String] = {
      val rel = relPath(sourceDir, files.head.getPath.toString)
      rel.split('/').dropRight(1).filter(_.contains('='))
        .map(_.split("=", 2)(0)).toSeq
    }
    val spec =
      if (partCols.isEmpty) PartitionSpec.unpartitioned
      else partCols.foldLeft(PartitionSpec.builderFor(fullSchema))(
        (b, c) => b.identity(c)).build()
    val props = properties ++
      (if (partCols.nonEmpty) Map(TableProperties.InjectPartitionConstants -> "true")
       else Map.empty)
    val table = IceTable.create(spark, location, fullSchema, spec, properties = props)
    addFiles(table, sourceDir, files.map(_.getPath.toString))
    table
  }

  /** Register additional existing parquet files into `table` (add_files). */
  def addFiles(table: IceTable, baseDir: String, paths: Seq[String]): Unit = {
    val m = table.meta
    val schema = m.schema
    val spec = m.spec
    val conf = table.spark.sparkContext.hadoopConfiguration
    val metas = paths.map { p =>
      val partValues: Seq[Any] = if (spec.isUnpartitioned) Nil else {
        val dirs = relPath(baseDir, p).split('/').dropRight(1)
          .filter(_.contains('='))
          .map { seg =>
            val Array(k, v) = seg.split("=", 2)
            k -> ExternalCatalogUtils.unescapePathName(v)
          }.toMap
        spec.fields.map { pf =>
          val raw = dirs.getOrElse(pf.name,
            throw new IllegalArgumentException(s"No partition dir ${pf.name} in $p"))
          if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
          else Writes.parsePartitionValue(raw, spec.fieldType(schema, pf))
        }
      }
      val metrics = MetricsModes.apply(ParquetMetrics.read(conf, p, schema),
        schema, MetricsModes.forTable(m))
      val st = table.io.listRecursive(p).headOption
      DataFileMeta(
        path = p, format = "parquet", specId = spec.specId, partition = partValues,
        recordCount = metrics.recordCount,
        fileSizeBytes = st.map(_.getLen).getOrElse(0L),
        valueCounts = metrics.valueCounts, nullCounts = metrics.nullCounts,
        nanCounts = metrics.nanCounts, lowerBounds = metrics.lowerBounds,
        upperBounds = metrics.upperBounds, splitOffsets = metrics.splitOffsets,
        schemaId = m.currentSchemaId)
    }
    table.commitSnapshot(Operation.Append, metas, Set.empty,
      Map("imported-files" -> metas.size.toString))
  }

  private def relPath(base: String, full: String): String = {
    val b = new org.apache.hadoop.fs.Path(base).toUri.getPath
    val f = new org.apache.hadoop.fs.Path(full).toUri.getPath
    f.stripPrefix(b).stripPrefix("/")
  }
}
