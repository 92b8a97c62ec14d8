package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Spark's ORC `FileFormat` plus the graft open-time integrity probe
  * ([[graft.sources.OrcContentGuard]]): when the conf carries
  * `graft.encryption.plaintext-files-allowed=false` (scans of tables that
  * REQUIRE encryption), every task verifies the file's tail declares
  * column encryption BEFORE the parent reader serves a single row —
  * parquet gets the same refusal from its decryption factory and avro
  * from its container magic sniff, but ORC has no per-file decryption
  * hook, so a forged plaintext ORC file swapped at a live keyed path
  * would otherwise be read as ordinary rows. Lives in the
  * `org.apache.spark.sql` namespace because
  * `buildReaderWithPartitionValues` is `private[sql]` (same extension
  * technique as [[ColumnBridge]]). Engaged only by graft's own scans
  * (selected by class name or constructed directly) and only when the
  * refusal flag is set — plain ORC reads never see it. */
class GraftGuardedOrcFileFormat extends OrcFileFormat {

  override def buildReaderWithPartitionValues(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String], hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val base = super.buildReaderWithPartitionValues(sparkSession, dataSchema,
      partitionSchema, requiredSchema, filters, options, hadoopConf)
    if (hadoopConf.getBoolean(
        graft.table.EncryptionManagers.PlaintextFilesAllowedKey, true)) base
    else {
      val confSer = new SerializableConfiguration(hadoopConf)
      pf => {
        graft.sources.OrcContentGuard.requireEncrypted(
          pf.filePath.toString, confSer.value)
        base(pf)
      }
    }
  }

  override def shortName(): String = "graft-guarded-orc"
  override def toString: String = "graft-guarded-orc"
}
