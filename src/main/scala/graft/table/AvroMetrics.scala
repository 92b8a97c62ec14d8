package graft.table

import graft.meta.Schema

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Per-file metrics for Avro data files. Avro object-container files carry a
  * per-block record count in the block header but no column statistics (same
  * in the ref: `core/.../avro/AvroMetrics.java` records counts only), so
  * scans of Avro files prune on partition values and record counts but never
  * on column bounds — conservative and correct. The count sums block headers
  * without decoding any datum. */
object AvroMetrics {

  def read(conf: Configuration, path: String, schema: Schema,
      enc: Option[EncryptionManager] = None): ParquetMetrics.FileMetrics = {
    val reader =
      graft.sources.GraftAvroFileFormat.openReader(new Path(path), conf, enc)
    try {
      var rows = 0L
      while (reader.hasNext) {
        rows += reader.getBlockCount
        reader.nextBlock()
      }
      ParquetMetrics.FileMetrics(rows, Map.empty, Map.empty, Map.empty,
        Map.empty, Map.empty, Nil)
    } finally reader.close()
  }
}
