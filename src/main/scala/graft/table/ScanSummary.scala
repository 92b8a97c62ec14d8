package graft.table

import graft.meta.model.{EntryStatus, Operation}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-activity summary over a commit-time range (ref
  * `core/.../ScanSummary.java`): top-N partitions by rows added in snapshots
  * committed within [fromMillis, toMillis]. */
object ScanSummary {

  def partitions(table: IceTable, fromMillis: Long, toMillis: Long,
      limit: Int = 10): DataFrame = {
    val m = table.meta
    val snaps = m.snapshots.filter(s =>
      s.timestampMillis >= fromMillis && s.timestampMillis <= toMillis &&
        s.operation == Operation.Append)
    val snapIds = snaps.map(_.snapshotId).toSet
    val entries = snaps.flatMap { s =>
      table.readManifestList(m, s).filter(mf => snapIds.contains(mf.addedSnapshotId))
        .flatMap(mf => ManifestIO.read(table.io, mf.path, m.schema, m.specById))
    }.filter(e => e.status == EntryStatus.Added && snapIds.contains(e.snapshotId))
      .distinctBy(_.dataFile.path)
    val rows = entries.map { e =>
      val spec = m.specById(e.dataFile.specId)
      val part = spec.fields.zip(e.dataFile.partition)
        .map { case (pf, v) => s"${pf.name}=${String.valueOf(v)}" }.mkString("/")
      (part, e.dataFile.recordCount, e.dataFile.fileSizeBytes)
    }
    import table.spark.implicits._
    rows.toDF("partition", "records", "bytes")
      .groupBy("partition")
      .agg(sum("records").as("added_records"), count(lit(1)).as("added_files"),
        sum("bytes").as("added_bytes"))
      .orderBy(desc("added_records"), asc("partition"))
      .limit(limit)
  }
}
