package graft.streaming

import graft.table.IceTable

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Native `spark.readStream` / `writeStream` integration (ref
  * `spark3/.../source/SparkMicroBatchStream.java` + `SparkWrite.java:156`
  * StreamingAppend), upgrading the checkpointed [[Streaming.IncrementalReader]]
  * to a real Structured Streaming source whose offsets Spark checkpoints:
  *
  * {{{
  * spark.readStream.format("graft-stream").option("path", loc).load()
  *   .writeStream.format("graft-stream").option("path", loc2)
  *   .option("checkpointLocation", cp).start()
  * }}}
  *
  * Offsets are snapshot ids (ref `StreamingOffset.java:33`); each micro-batch
  * is `appendsBetween(start, end)` — incremental appends only, no rescan. The
  * sink appends with the (queryId, epochId) idempotency marker, so replayed
  * epochs after restart commit nothing.
  */
class GraftStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def tableOf(sqlContext: SQLContext, parameters: Map[String, String]): IceTable = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-stream requires option(\"path\", ...)"))
    // encrypted tables stream too: `option("encryption", EncryptionManagers
    // .serialize(manager))` loads the table through a keyed FileIO, so the
    // source decrypts and the sink encrypts exactly like batch IO; without
    // it a keyed table refuses at plan time (never plaintext rows, never
    // silently-plaintext appends into an encrypted table)
    parameters.get("encryption") match {
      case Some(ser) =>
        IceTable.loadWith(sqlContext.sparkSession,
          new graft.table.TableOperations(path, new graft.table.FileIO(
            sqlContext.sparkSession.sparkContext.hadoopConfiguration,
            graft.table.EncryptionManagers.deserialize(ser),
            // same loader-asserted sealing as the batch source: the
            // stored property bootstraps from attacker-writable storage
            parameters.get("encryption-required").exists(_.toBoolean))))
      case None => IceTable.load(sqlContext.sparkSession, path)
    }
  }

  private def readChanges(parameters: Map[String, String]): Boolean =
    parameters.get("read-changes").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val t = tableOf(sqlContext, parameters)
    val s = if (readChanges(parameters)) GraftChangelogSource.schemaOf(t)
      else t.schema.struct
    ("graft-stream", s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    if (readChanges(parameters))
      // CDC mode: each micro-batch is the row-level changelog of the
      // committed snapshot range — inserts AND deletes, with change metadata
      new GraftChangelogSource(tableOf(sqlContext, parameters),
        parameters.get("starting-snapshot-id").map(_.toLong))
    else new GraftStreamSource(tableOf(sqlContext, parameters),
      // ref SparkReadOptions.java:55 STREAMING_SKIP_DELETE_SNAPSHOTS:
      // true (default) silently skips delete/overwrite snapshots in the
      // stream; false fails the batch so data loss is surfaced
      parameters.getOrElse("streaming-skip-delete-snapshots", "true").toBoolean)

  /** Sink modes: plain epoch-idempotent append (default), or keyed UPSERT
    * via `option("mode", "upsert")` / `option("upsert-keys", "a,b")` — each
    * epoch commits an equality-delete of the batch keys plus the new rows
    * in one snapshot (keys default to the table's identifier fields). */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val upsertKeys = parameters.get("upsert-keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val upsert = parameters.get("mode").exists(_.equalsIgnoreCase("upsert")) ||
      upsertKeys.nonEmpty
    val queryId = parameters.getOrElse("queryId", "graft-stream")
    if (outputMode == OutputMode.Complete) {
      // Complete-mode aggregation stream: each epoch's full result REPLACES
      // the table (ref SparkWrite StreamingOverwrite), epoch-idempotent.
      // Default marker id is mode-scoped: a Complete query starting on a
      // table previously fed by an APPEND stream with the shared default
      // id would read that stream's high epoch marker and silently skip
      // its own early epochs. Cross-RESTART reuse with a fresh checkpoint
      // still needs an explicit queryId, as with every idempotent sink.
      require(!upsert, "upsert mode is Append/Update; Complete mode already " +
        "replaces the table every epoch")
      val completeQueryId = parameters.getOrElse("queryId", "graft-stream-complete")
      new GraftCompleteSink(tableOf(sqlContext, parameters), completeQueryId)
    } else if (upsert) {
      require(outputMode == OutputMode.Append || outputMode == OutputMode.Update,
        s"graft-stream upsert sink supports Append/Update output modes, got $outputMode")
      new GraftUpsertSink(tableOf(sqlContext, parameters), queryId,
        upsertKeys.getOrElse(Nil))
    } else {
      require(outputMode == OutputMode.Append,
        s"graft-stream sink supports Append output mode only, got $outputMode")
      new GraftStreamSink(tableOf(sqlContext, parameters), queryId)
    }
  }
}

private final case class GraftSnapshotOffset(snapshotId: Long) extends V1Offset {
  override def json(): String = snapshotId.toString
}

/** Source over the snapshot log: `getOffset` is the current snapshot id,
  * `getBatch` the appends between two snapshots (full table on first batch). */
private final class GraftStreamSource(table: IceTable,
    skipDeleteSnapshots: Boolean) extends Source {

  override def schema: StructType = table.schema.struct

  override def getOffset: Option[V1Offset] =
    table.meta.currentSnapshotId.map(GraftSnapshotOffset)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endId = end.json().toLong
    val batch = start.map(_.json().toLong) match {
      case Some(from) if from == endId =>
        table.toDF.limit(0)
      case Some(from) => table.appendsBetween(from, endId, skipDeleteSnapshots)
      case None => table.newScan().useSnapshot(endId).toDF
    }
    // V1 contract: the returned frame must carry isStreaming=true — re-anchor
    // the physical rows like FileStreamSource does
    val spark = table.spark
    org.apache.spark.sql.graft.ColumnBridge.internalCreateDataFrame(spark,
      org.apache.spark.sql.graft.ColumnBridge.toInternalRdd(batch),
      batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

/** CDC streaming source: offsets are snapshot ids, each micro-batch is the
  * row-level changelog of `(start, end]` — inserts and deletes with
  * `_change_type` / `_commit_snapshot_id` / `_change_ordinal` (ordinals are
  * dense WITHIN a batch). The first batch replays history from the table's
  * first snapshot (or from the exclusive `starting-snapshot-id` option), so
  * a downstream keyed state bootstrap sees the initial rows as inserts.
  * Compaction (`replace`) snapshots emit nothing, and an expired `from`
  * offset fails loudly instead of replaying the table (Changelog's
  * validation).
  *
  * Supports `Trigger.AvailableNow` the same way Spark's own V1 Kafka source
  * does — a V1 `Source` additionally implementing
  * [[SupportsTriggerAvailableNow]]: the end snapshot is pinned at prepare
  * time, so a changelog backfill-then-stop job drains exactly the commits
  * that existed at start and keeps the guarantee even while writers keep
  * committing (no silent fall-back to single-batch execution). */
private final class GraftChangelogSource(table: IceTable,
    startingSnapshotId: Option[Long])
    extends Source with SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset}

  override def schema: StructType = GraftChangelogSource.schemaOf(table)

  // Some(pinned end) after prepareForTriggerAvailableNow; the inner Option
  // distinguishes "pinned on an empty table" (drain nothing) from unpinned
  @volatile private var availableNowEnd: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.meta.currentSnapshotId)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control offset advance (Spark calls this INSTEAD of
    * `getOffset` once the source declares admission control): the current
    * snapshot, or the prepare-time pin under AvailableNow. The changelog is
    * snapshot-granular and each batch materializes one range, so read
    * limits beyond allAvailable don't subdivide further. */
  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset =
    availableNowEnd.getOrElse(table.meta.currentSnapshotId)
      .map(GraftSnapshotOffset).orNull

  override def reportLatestOffset(): ConnOffset =
    table.meta.currentSnapshotId.map(GraftSnapshotOffset).orNull

  override def getOffset: Option[V1Offset] =
    table.meta.currentSnapshotId.map(GraftSnapshotOffset)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endId = end.json().toLong
    val from = start.map(_.json().toLong).orElse(startingSnapshotId)
    val batch = table.changelog(from, Some(endId))
    val spark = table.spark
    org.apache.spark.sql.graft.ColumnBridge.internalCreateDataFrame(spark,
      org.apache.spark.sql.graft.ColumnBridge.toInternalRdd(batch),
      batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

private object GraftChangelogSource {
  def schemaOf(table: IceTable): StructType = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    table.schema.struct
      .add(graft.table.Changelog.ChangeTypeCol, StringType, nullable = false)
      .add(graft.table.Changelog.SnapshotIdCol, LongType, nullable = false)
      .add(graft.table.Changelog.OrdinalCol, IntegerType, nullable = false)
  }
}

/** Idempotent append sink: replayed epochs (restart recovery) are skipped via
  * the (queryId, epochId) marker in the snapshot summary. */
private final class GraftStreamSink(table: IceTable, queryId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    Streaming.appendOnce(table, queryId, GraftStreamSink.reanchor(data), batchId)
}

private object GraftStreamSink {
  /** Re-anchor on the physical rows: the incoming frame belongs to the
    * streaming query's IncrementalExecution and can't be re-analyzed. */
  def reanchor(data: DataFrame): DataFrame = {
    val spark = data.sparkSession
    val rows = org.apache.spark.sql.graft.ColumnBridge.toInternalRdd(data)
    org.apache.spark.sql.graft.ColumnBridge
      .internalCreateDataFrame(spark, rows, data.schema)
  }
}

/** Complete-mode overwrite sink: every epoch's full aggregation result
  * replaces the table in one snapshot; replayed epochs are skipped. */
private final class GraftCompleteSink(table: IceTable, queryId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    Streaming.completeOnce(table, queryId, GraftStreamSink.reanchor(data), batchId)
}

/** Keyed upsert sink: per epoch, ONE snapshot of (equality-delete file of
  * the batch's keys + appended rows) — CDC upserts with no target scan. */
private final class GraftUpsertSink(table: IceTable, queryId: String,
    keys: Seq[String]) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    Streaming.upsertOnce(table, queryId, keys,
      GraftStreamSink.reanchor(data), batchId)
}
