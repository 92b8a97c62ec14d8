package graft.streaming

import graft.table.IceTable

import org.apache.spark.sql.DataFrame

/** Streaming integration (ref `spark3/.../source/SparkMicroBatchStream.java`,
  * `SparkWrite.java:156` StreamingAppend): the source side is an
  * offset-checkpointed incremental reader over the snapshot log (offsets are
  * snapshot ids — ref `StreamingOffset.java:33`); the sink side is a
  * `foreachBatch` appender made idempotent by recording (queryId, epochId) in
  * the snapshot summary, exactly like the ref skips replayed epochs.
  */
object Streaming {

  /** Sink for `df.writeStream.foreachBatch(Streaming.appendSink(table, "q1"))`:
    * appends each epoch once, skipping epochs already committed (replays
    * after restart). */
  def appendSink(table: IceTable, queryId: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, epochId: Long) => appendOnce(table, queryId, batch, epochId)

  def appendOnce(table: IceTable, queryId: String, batch: DataFrame, epochId: Long): Unit = {
    val committed = lastCommittedEpoch(table, queryId)
    if (committed.exists(_ >= epochId)) return // replayed epoch: skip
    table.append(batch,
      Map("streaming-query-id" -> queryId, "streaming-epoch-id" -> epochId.toString))
  }

  /** Complete-mode epoch: replace the WHOLE table with this epoch's result
    * (ref `SparkWrite.java` StreamingOverwrite — `overwriteByRowFilter(
    * alwaysTrue)` per epoch). Replay-safe through the same (queryId,
    * epochId) marker as the append sink: a recovered query re-offering a
    * committed epoch commits nothing, so exactly one copy survives. */
  def completeOnce(table: IceTable, queryId: String, batch: DataFrame,
      epochId: Long): Unit = {
    if (lastCommittedEpoch(table, queryId).exists(_ >= epochId)) return // replay
    table.overwrite(graft.meta.expr.TrueExpr, batch,
      Map("streaming-query-id" -> queryId,
        "streaming-epoch-id" -> epochId.toString))
  }

  def lastCommittedEpoch(table: IceTable, queryId: String): Option[Long] =
    table.meta.snapshots.reverseIterator
      .find(_.summary.get("streaming-query-id").contains(queryId))
      .flatMap(_.summary.get("streaming-epoch-id")).map(_.toLong)

  /** Sink for a KEYED CDC/upsert stream
    * (`df.writeStream.foreachBatch(Streaming.upsertSink(table, "q1"))`):
    * each epoch becomes ONE snapshot holding an equality-delete file of the
    * batch's keys plus the appended rows — the ref's Flink CDC shape
    * (`EqualityDeleteWriter.java` + row delta). No target data file is read
    * or rewritten: old rows with the same keys are suppressed at read time
    * by the sequence rule (eq deletes apply only to STRICTLY earlier data,
    * so the rows appended in the same snapshot survive). `keys` defaults to
    * the table's identifier fields (`ALTER TABLE ... SET IDENTIFIER
    * FIELDS`). Batches carrying several rows per key are reduced with
    * `dropDuplicates(keys)` — emit at most one row per key per epoch
    * upstream if the choice matters. */
  def upsertSink(table: IceTable, queryId: String,
      keys: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch: DataFrame, epochId: Long) =>
      upsertOnce(table, queryId, keys, batch, epochId)

  def upsertOnce(table: IceTable, queryId: String, keys: Seq[String],
      batch: DataFrame, epochId: Long): Unit = {
    if (lastCommittedEpoch(table, queryId).exists(_ >= epochId)) return // replay
    val m = table.meta
    val keyCols = if (keys.nonEmpty) keys else m.schema.identifierFieldNames
    require(keyCols.nonEmpty,
      "upsert sink needs key columns: pass keys or set table identifier fields")
    val rows = batch.dropDuplicates(keyCols)
    graft.table.MergeOnRead.upsertDelta(table, keyCols, rows,
      Map("streaming-query-id" -> queryId,
        "streaming-epoch-id" -> epochId.toString))
  }

  /** Micro-batch incremental reader: each `next()` returns the rows appended
    * since the checkpointed snapshot (or everything on first call), advancing
    * the offset only when `commit()` is called — at-least-once, exactly-once
    * when paired with [[appendSink]]'s idempotent epochs. */
  final class IncrementalReader(table: IceTable, checkpointPath: String) {
    private def io = table.io

    def currentOffset: Option[Long] =
      if (io.exists(checkpointPath)) Some(io.readString(checkpointPath).trim.toLong)
      else None

    /** (batch, endOffset); empty when caught up. */
    def next(): Option[(DataFrame, Long)] = {
      val m = table.meta
      val end = m.currentSnapshotId.getOrElse(return None)
      currentOffset match {
        case Some(from) if from == end => None
        case Some(from) => Some((table.appendsBetween(from, end), end))
        case None => Some((table.toDF, end))
      }
    }

    def commit(offset: Long): Unit = io.writeString(checkpointPath, offset.toString)
  }
}
