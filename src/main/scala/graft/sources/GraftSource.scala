package graft.sources

import java.util

import graft.spark.GraftSparkTable
import graft.table.IceTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-based table provider (ref `spark3/.../IcebergSource.java`):
  * `spark.read.format("graft").load("/path/to/table")` reads a graft table
  * by location with the full pruning cascade, and the registered shortname
  * makes `CREATE TABLE ... USING graft` resolve as a provider for
  * [[graft.spark.GraftSessionCatalog]]. */
class GraftSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def tablePath(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path option"))
    p
  }

  private def load(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val path = tablePath(options)
    // encrypted tables path-load too (same option the streaming provider
    // takes): a serialized manager keys the FileIO, without it a keyed
    // table refuses at the sealed-metadata read
    val t = Option(options.get("encryption")) match {
      case Some(ser) => IceTable.loadWith(spark,
        new graft.table.TableOperations(path, new graft.table.FileIO(
          spark.sparkContext.hadoopConfiguration,
          // the bounded sources-package cache: repeated path loads must
          // not re-run Java deserialization per load
          GraftParquetCryptoFactory.cachedManager(ser),
          // loader-asserted sealing: the stored encryption.required
          // property bootstraps from storage an attacker may control
          // (a forged plaintext metadata JSON omitting the property
          // disables every downstream forgery guard), so a caller who
          // knows the table is sealed asserts it here and the FIRST
          // metadata read already refuses plaintext
          options.getBoolean("encryption-required", false))))
      case None => IceTable.load(spark, path)
    }
    val snapshotId = Option(options.get("snapshot-id")).map(_.toLong)
    val asOf = Option(options.get("as-of-timestamp")).map(_.toLong)
    new GraftSparkTable(t, s"graft.`$path`", snapshotId, asOf)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    load(options).asInstanceOf[GraftSparkTable].schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    load(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}
