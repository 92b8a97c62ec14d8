package graft

import java.nio.file.Files

import graft.meta.Schema
import graft.table.IceTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native readStream/writeStream over graft tables (ref
  * `SparkMicroBatchStream` / `StreamingAppend`). */
class StreamingSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val orders = Tables.load(spark, sf0001, "orders").cache()

  test("readStream -> writeStream pipes appends incrementally and exactly-once") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val srcLoc = s"$base/src"; val dstLoc = s"$base/dst"; val cp = s"$base/cp"
    val src = IceTable.create(spark, srcLoc, Schema.fresh(orders.schema))
    val dst = IceTable.create(spark, dstLoc, Schema.fresh(orders.schema))
    src.append(orders.limit(30))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-stream").option("path", srcLoc).load()
        .writeStream.format("graft-stream").option("path", dstLoc)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    runOnce()
    assert(dst.toDF.count() === 30) // initial load

    src.append(orders.limit(40).exceptAll(orders.limit(30)))
    runOnce()
    assert(dst.toDF.count() === 40) // only the 10 appended rows flowed

    // no new data: restart moves nothing (offset checkpointing + idempotency)
    runOnce()
    assert(dst.toDF.count() === 40)
    // every sink snapshot carries the idempotency marker
    assert(dst.snapshots.forall(_.summary.contains("streaming-epoch-id")))
  }

  test("streaming between ENCRYPTED tables: keyed source and sink via the encryption option") {
    import graft.table.{AesGcmEncryptionManager, EncryptionManagers, FileIO,
      TableOperations, ValidationException}
    val conf = spark.sparkContext.hadoopConfiguration
    val manager = new AesGcmEncryptionManager(
      "0123456789abcdef0123456789abcdef".getBytes("UTF-8"), "st")
    val ser = EncryptionManagers.serialize(manager)
    val base = Files.createTempDirectory("graft-stream-enc-").toString
    val srcLoc = s"$base/src"; val dstLoc = s"$base/dst"; val cp = s"$base/cp"
    val src = IceTable.createWith(spark,
      new TableOperations(srcLoc, new FileIO(conf, manager)),
      Schema.fresh(orders.schema))
    val dst = IceTable.createWith(spark,
      new TableOperations(dstLoc, new FileIO(conf, manager)),
      Schema.fresh(orders.schema))
    src.append(orders.limit(20))
    val q = spark.readStream.format("graft-stream").option("path", srcLoc)
      .option("encryption", ser).load()
      .writeStream.format("graft-stream").option("path", dstLoc)
      .option("encryption", ser)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    assert(dst.toDF.count() === 20)
    // the sink's files are keyed ciphertext (PARE parquet), not plaintext
    dst.newScan().planFiles().map(_.file).foreach { f =>
      assert(f.keyMetadata.nonEmpty, f.path)
      val p = new org.apache.hadoop.fs.Path(f.path)
      val in = p.getFileSystem(conf).open(p)
      val head = try new String(in.readNBytes(4), "UTF-8") finally in.close()
      assert(head === "PARE", s"${f.path} not encrypted on disk")
    }
    // without the option, a keyed source refuses — the stream fails, it
    // never emits plaintext rows
    val failed = intercept[Exception] {
      val q2 = spark.readStream.format("graft-stream").option("path", srcLoc)
        .load()
        .writeStream.format("noop").option("checkpointLocation", s"$base/cp2")
        .start()
      try q2.processAllAvailable() finally q2.stop()
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    // r11 sealed metadata: the refusal now fires at the metadata read
    // ("…manager is plaintext") — still loud, still zero plaintext rows
    assert(causes(failed).exists(c => c.isInstanceOf[ValidationException] ||
      Option(c.getMessage).exists(m =>
        m.contains("key metadata") || m.contains("manager is plaintext"))),
      failed.toString)
  }

  test("Complete-mode sink: each epoch's aggregation replaces the table; replay is a no-op") {
    val base = Files.createTempDirectory("graft-stream-").toString
    import spark.implicits._
    val dst = IceTable.create(spark, s"$base/agg",
      Schema.fresh(Seq(("x", 1L)).toDF("k", "cnt").schema))

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String](spark)
    val counts = mem.toDF().groupBy(col("value").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("k"), col("cnt"))
    val q = counts.writeStream.format("graft-stream")
      .option("path", dst.location)
      .option("checkpointLocation", s"$base/cp")
      .outputMode("complete")
      .start()
    try {
      mem.addData("a", "a", "b")
      q.processAllAvailable()
      assert(dst.toDF.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("a" -> 2L, "b" -> 1L))
      // next epoch REPLACES, not appends: totals, exactly once each
      mem.addData("a", "c")
      q.processAllAvailable()
      assert(dst.toDF.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
      assert(dst.toDF.count() === 3) // one row per key — no stacked epochs
    } finally q.stop()
    // epoch replay (restart recovery re-offers a committed epoch): no-op
    val rowsBefore = dst.toDF.collect().toSet
    val snapsBefore = dst.snapshots.size
    val lastEpoch = graft.streaming.Streaming
      .lastCommittedEpoch(dst, "graft-stream-complete").get
    graft.streaming.Streaming.completeOnce(dst, "graft-stream-complete",
      Seq(("zz", 9L)).toDF("k", "cnt"), lastEpoch)
    assert(dst.snapshots.size === snapsBefore, "replayed epoch must not commit")
    assert(dst.toDF.collect().toSet === rowsBefore)
    // a FRESH epoch does commit and replaces everything
    graft.streaming.Streaming.completeOnce(dst, "graft-stream-complete",
      Seq(("zz", 9L)).toDF("k", "cnt"), lastEpoch + 1)
    assert(dst.toDF.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      === Map("zz" -> 9L))
  }

  test("keyed upsert sink: last writer wins over 3 epochs, no data file rewritten") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val srcLoc = s"$base/src"; val dstLoc = s"$base/dst"; val cp = s"$base/cp"
    import spark.implicits._
    val src = IceTable.create(spark, srcLoc,
      Schema.fresh(Seq((1L, "x", 0)).toDF("k", "v", "epoch").schema))
    val dst = IceTable.create(spark, dstLoc,
      Schema.fresh(Seq((1L, "x", 0)).toDF("k", "v", "epoch").schema))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-stream").option("path", srcLoc).load()
        .writeStream.format("graft-stream").option("path", dstLoc)
        .option("mode", "upsert").option("upsert-keys", "k")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    // epoch 1: keys 1..4; epoch 2: update 2,3; epoch 3: update 3 + insert 5
    val epochs = Seq(
      Seq((1L, "a1", 1), (2L, "b1", 1), (3L, "c1", 1), (4L, "d1", 1)),
      Seq((2L, "b2", 2), (3L, "c2", 2)),
      Seq((3L, "c3", 3), (5L, "e3", 3)))
    epochs.foreach { rows =>
      src.append(rows.toDF("k", "v", "epoch"))
      runOnce()
    }
    // last-writer-wins oracle
    val got = dst.toDF.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "a1", 2L -> "b2", 3L -> "c3", 4L -> "d1", 5L -> "e3"))
    assert(dst.toDF.count() === 5)
    // no data file was rewritten: every epoch's data files are still live,
    // and suppression happened via equality-delete files only
    val live = dst.newScan().planFiles()
    assert(dst.newScan().planDeletes()
      .count(_._1.content === graft.meta.model.FileContent.EqualityDeletes) >= 2)
    // rows physically present across live data files = all 8 upserted rows
    val rawRows = live.map(_.file.recordCount).sum
    assert(rawRows === 8, s"expected all epoch rows still on disk, got $rawRows")
    // replayed epoch: re-running with same checkpoint moves nothing
    runOnce()
    assert(dst.toDF.count() === 5)
  }

  test("appendsBetween: delete snapshots skipped by default, rejected when strict") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val t = IceTable.create(spark, s"$base/t", Schema.fresh(orders.schema))
    t.append(orders.limit(20))
    val v1 = t.currentSnapshot.get.snapshotId
    t.delete(graft.meta.expr.Exprs.lessThan("o_orderkey", 100L))
    t.append(orders.limit(30).exceptAll(orders.limit(20)))
    val v3 = t.currentSnapshot.get.snapshotId
    // default: the delete snapshot in range is skipped, appends flow
    assert(t.appendsBetween(v1, v3).count() === 10)
    // strict consumers get an error instead of silently missing deletions
    intercept[graft.table.ValidationException] {
      t.appendsBetween(v1, v3, skipDeleteSnapshots = false).count()
    }
  }

  test("streaming-skip-delete-snapshots=false fails the stream on a delete") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val srcLoc = s"$base/src"; val dstLoc = s"$base/dst"; val cp = s"$base/cp"
    val src = IceTable.create(spark, srcLoc, Schema.fresh(orders.schema))
    IceTable.create(spark, dstLoc, Schema.fresh(orders.schema))
    src.append(orders.limit(20))

    def runOnce(strict: Boolean): Unit = {
      val q = spark.readStream.format("graft-stream").option("path", srcLoc)
        .option("streaming-skip-delete-snapshots", (!strict).toString).load()
        .writeStream.format("graft-stream").option("path", dstLoc)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runOnce(strict = true) // initial full load: no delete in range yet
    src.delete(graft.meta.expr.Exprs.lessThan("o_orderkey", 100L))
    src.append(orders.limit(30).exceptAll(orders.limit(20)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(strict = true)
    }
    assert(e.getMessage.contains("delete/overwrite") ||
      Option(e.getCause).exists(_.getMessage.contains("delete/overwrite")))
    // default (skip) processes the appends past the delete snapshot
    runOnce(strict = false)
    assert(IceTable.load(spark, dstLoc).toDF.count() === 30)
  }

  test("flatMapGroupsWithState sessionization: stream equals the batch twin") {
    val base = Files.createTempDirectory("graft-sess-").toString
    import spark.implicits._
    val gapUs = 43200000000L // 12 hours in micros — the q39 gap
    // real events with a TIMESTAMP event-time column (handles both the
    // long-nanos and TIMESTAMP_NTZ surfacings of the parquet NANOS column)
    val events = Tables.load(spark, sf0001, "events")
    val tse = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _ => expr("cast(ts as timestamp)")
    }
    val raw = events.select(col("user_id"), tse.as("tse"), col("value"))
      .orderBy("tse")
    // the batch twin on epoch micros — ALSO the expected stream output
    val expected = graft.streaming.Sessionize.sessionizeBatch(
        raw.select(col("user_id"), unix_micros(col("tse")).as("tsu"), col("value")),
        "user_id", "tsu", "value", gapUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        r.getDouble(4)).toMap
    assert(expected.size > 100, s"gap too coarse: ${expected.size} sessions")
    // split INSIDE a long session so cross-batch state is provably engaged
    val span = expected.keys.filter(k => k._4 >= 4).maxBy(k => k._3 - k._2)
    val cutUs = (span._2 + span._3) / 2
    val rows = raw.collect()
    def micros(r: org.apache.spark.sql.Row): Long = {
      val t = r.getTimestamp(1)
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    }
    val (h1, h2) = rows.partition(micros(_) <= cutUs)
    assert(h1.nonEmpty && h2.nonEmpty)
    val src = IceTable.create(spark, s"$base/src", Schema.fresh(raw.schema))
    src.append(spark.createDataFrame(
      spark.sparkContext.parallelize(h1.toSeq, 2), raw.schema))
    src.append(spark.createDataFrame(
      spark.sparkContext.parallelize(h2.toSeq, 2), raw.schema))
    // sentinel far past every timeout: advances the watermark beyond
    // end + gap for every REAL session (watermarks update at batch END)
    val maxUs = rows.map(micros).max
    src.append(Seq((-1L, new java.sql.Timestamp(maxUs / 1000 + 100L * (gapUs / 1000)), 0.0))
      .toDF("user_id", "tse", "value"))

    // sink into a graft TABLE (a memory sink resets across query runs)
    val dstSchema = Seq((0L, 0L, 0L, 0L, 0.0)).toDF(
      "user_id", "session_start", "session_end", "n_events", "total_value").schema
    IceTable.create(spark, s"$base/dst", Schema.fresh(dstSchema))
    def runOnce(): Unit = {
      val in = spark.readStream.format("graft-stream")
        .option("path", s"$base/src").option("max-files-per-trigger", "1").load()
      val q = graft.streaming.Sessionize
        .sessionizeStream(in, "user_id", "tse", "value", gapUs, "0 seconds")
        .toDF()
        .writeStream.format("graft-stream").option("path", s"$base/dst")
        .option("checkpointLocation", s"$base/cp").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    runOnce()
    // the timeout sweep runs when a batch EXECUTES after the watermark
    // moved (same harness behavior the windowed-agg test pins): a second
    // sentinel and a second drain fire the event-time timeouts for the
    // trailing open sessions
    src.append(Seq((-1L, new java.sql.Timestamp(maxUs / 1000 + 200L * (gapUs / 1000)), 0.0))
      .toDF("user_id", "tse", "value"))
    runOnce()
    val streamed = IceTable.load(spark, s"$base/dst").toDF.collect()
      .filter(_.getLong(0) >= 0) // drop the sentinel user's open remainder
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        r.getDouble(4)).toMap
    // identical sessions; totals within FP-addition-order tolerance (the
    // stream sums in event order, the batch aggregate in partition order)
    assert(streamed.keySet === expected.keySet,
      s"session sets differ: ${streamed.size} vs ${expected.size}")
    streamed.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-6, s"$k: $v vs ${expected(k)}")
    }
  }

  test("watermarked window aggregation: append-mode windows flush across batches") {
    val base = Files.createTempDirectory("graft-stream-").toString
    import spark.implicits._
    def ev(h: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:30:00"), v)
    val srcDF = Seq(ev(1, 1.0), ev(1, 2.0), ev(2, 5.0)).toDF("ts", "v")
    val src = IceTable.create(spark, s"$base/src", Schema.fresh(srcDF.schema))
    val dstSchema = Seq((ev(1, 0.0)._1, 0.0)).toDF("ws", "total").schema
    val dst = IceTable.create(spark, s"$base/dst", Schema.fresh(dstSchema))
    src.append(srcDF)

    def runOnce(): Unit = {
      val in = spark.readStream.format("graft-stream").option("path", s"$base/src").load()
      val agg = in.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour")).agg(sum("v").as("total"))
        .select(col("window.start").as("ws"), col("total"))
      val q = agg.writeStream.format("graft-stream").option("path", s"$base/dst")
        .option("checkpointLocation", s"$base/cp").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    // batch 1 runs with watermark 0 — no window is closed yet
    runOnce()
    assert(dst.toDF.count() === 0)
    // a later event advances the checkpointed watermark past hour 1's end
    src.append(Seq(ev(5, 9.0)).toDF("ts", "v"))
    runOnce()
    val rows = dst.toDF.select(hour(col("ws")), col("total")).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(rows === Set((1, 3.0))) // hour-1 window flushed; hour 2/5 still open
  }

  test("stateful mapGroupsWithState keeps running totals across restarts") {
    val base = Files.createTempDirectory("graft-stream-").toString
    import spark.implicits._
    val srcDF = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
    val src = IceTable.create(spark, s"$base/src", Schema.fresh(srcDF.schema))
    val dst = IceTable.create(spark, s"$base/dst", Schema.fresh(srcDF
      .toDF("k", "total").schema))
    src.append(srcDF)

    def runOnce(): Unit = {
      val in = spark.readStream.format("graft-stream").option("path", s"$base/src").load()
      val totals = in.as[(String, Long)].groupByKey(_._1)
        .mapGroupsWithState(
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
          (k: String, vs: Iterator[(String, Long)],
           state: org.apache.spark.sql.streaming.GroupState[Long]) =>
            val total = state.getOption.getOrElse(0L) + vs.map(_._2).sum
            state.update(total)
            (k, total)
        }.toDF("k", "total")
      val q = totals.writeStream
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
          dst.append(batch))
        .option("checkpointLocation", s"$base/cp").outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    runOnce()
    def latest(): Map[String, Long] =
      dst.toDF.groupBy("k").agg(max("total").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest() === Map("a" -> 3L, "b" -> 5L))
    // restart with more data: state restored from the checkpoint, not reset
    src.append(Seq(("a", 10L), ("c", 7L)).toDF("k", "v"))
    runOnce()
    assert(latest() === Map("a" -> 13L, "b" -> 5L, "c" -> 7L))
  }

  test("DSv2 micro-batch: readStream.table streams catalog appends incrementally") {
    val base = Files.createTempDirectory("graft-mbs-").toString
    spark.conf.set("spark.sql.catalog.gmb", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmb.warehouse", s"$base/wh")
    val src = IceTable.create(spark, s"$base/wh/db/t", Schema.fresh(orders.schema))
    src.append(orders.limit(30))

    val batches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    def runOnce(): Unit = {
      val before = batches.size
      val q = spark.readStream.table("gmb.db.t")
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            batches += b.select("o_orderkey").collect().map(_.getLong(0)).toSet
            ()
        }
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
      if (batches.size == before) batches += Set.empty // no batch ran
    }

    def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("o_orderkey").collect().map(_.getLong(0)).toSet

    runOnce()
    assert(batches(0) === keys(orders.limit(30))) // first batch = full snapshot

    src.append(orders.limit(40).exceptAll(orders.limit(30)))
    // restart from the checkpoint: ONLY the 10 appended rows flow
    runOnce()
    assert(batches(1) === keys(orders.limit(40)) -- keys(orders.limit(30)))
    assert(batches(1).size === 10)

    runOnce() // no new snapshot: nothing moves
    assert(batches(2).isEmpty)
  }

  test("DSv2 start-snapshot-id streams from that snapshot, not from scratch") {
    val base = Files.createTempDirectory("graft-mbs-").toString
    spark.conf.set("spark.sql.catalog.gmbs", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmbs.warehouse", s"$base/wh")
    val src = IceTable.create(spark, s"$base/wh/db/t", Schema.fresh(orders.schema))
    src.append(orders.limit(30))
    val mark = src.currentSnapshot.get.snapshotId
    src.append(orders.limit(40).exceptAll(orders.limit(30)))

    def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val got = scala.collection.mutable.Set[Long]()
    val q = spark.readStream
      .option("start-snapshot-id", mark.toString)
      .table("gmbs.db.t")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("o_orderkey").collect().map(_.getLong(0)); ()
      }
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    // only the 10 rows appended AFTER the marked snapshot flow — the 30
    // rows already in it are never replayed (ADVICE r6: the option was
    // silently ignored and the whole snapshot streamed)
    assert(got.toSet === keys(orders.limit(40)) -- keys(orders.limit(30)))

    // an unknown start snapshot fails loudly
    val bad = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val qb = spark.readStream.option("start-snapshot-id", "12345")
        .table("gmbs.db.t")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/cp-bad").start()
      qb.awaitTermination(60000)
    }
    assert(bad.getMessage.contains("not in this table's history") ||
      Option(bad.getCause).exists(_.getMessage.contains("not in this table's history")))

    // end-snapshot-id is batch-only: a bounded stream is rejected up front
    val err = intercept[Exception] {
      val qe = spark.readStream
        .option("start-snapshot-id", mark.toString)
        .option("end-snapshot-id", src.currentSnapshot.get.snapshotId.toString)
        .table("gmbs.db.t")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/cp2").start()
      qe.awaitTermination(60000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("batch-only")), messages(err).mkString("; "))
  }

  test("max-files-per-trigger splits catch-up into bounded micro-batches") {
    val base = Files.createTempDirectory("graft-mbs-").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gmb3", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmb3.warehouse", s"$base/wh")
    val t = IceTable.create(spark, s"$base/wh/db/t",
      Schema.fresh(Seq(0L).toDF("id").schema))
    t.append(Seq(0L).toDF("id").repartition(1))

    val batches = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def runOnce(maxFiles: Option[Int]): Unit = {
      var r = spark.readStream
      maxFiles.foreach(n => r = r.option("max-files-per-trigger", n.toString))
      val q = r.table("gmb3.db.t")
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = b.select("id").collect().map(_.getLong(0)).toSeq.sorted
            if (rows.nonEmpty) batches += rows
            ()
        }
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    runOnce(None) // initial load establishes the checkpoint
    assert(batches.toSeq === Seq(Seq(0L)))

    // three single-file append snapshots, then catch up with a 1-file budget:
    // each snapshot becomes its own micro-batch instead of one giant batch
    (1 to 3).foreach(i => t.append(Seq(i.toLong).toDF("id").repartition(1)))
    runOnce(Some(1))
    assert(batches.toSeq === Seq(Seq(0L), Seq(1L), Seq(2L), Seq(3L)),
      s"expected per-snapshot batches, got $batches")

    // budget 2: first batch takes two snapshots, second the remainder
    (4 to 6).foreach(i => t.append(Seq(i.toLong).toDF("id").repartition(1)))
    runOnce(Some(2))
    assert(batches.drop(4).toSeq === Seq(Seq(4L, 5L), Seq(6L)),
      s"expected 2+1 batching, got ${batches.drop(4)}")
  }

  test("initial catch-up honors max-files-per-trigger (file-index offsets)") {
    val base = Files.createTempDirectory("graft-mbs-").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gmb4", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmb4.warehouse", s"$base/wh")
    val t = IceTable.create(spark, s"$base/wh/db/t",
      Schema.fresh(Seq(0L).toDF("id").schema))
    // 4 files across 2 snapshots BEFORE the stream ever starts
    t.append((0L to 5L).toDF("id").repartition(2))
    t.append((6L to 11L).toDF("id").repartition(2))

    val batches = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = spark.readStream
      .option("max-files-per-trigger", "1")
      .table("gmb4.db.t")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("id").collect().map(_.getLong(0)).toSeq.sorted
        ()
      }
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    // one batch per file instead of one giant catch-up batch
    assert(batches.size === 4, s"expected 4 single-file batches, got $batches")
    assert(batches.forall(_.nonEmpty))
    assert(batches.flatten.sorted === (0L to 11L))
    // a later run resumes incrementally from the drained catch-up offset
    t.append(Seq(12L).toDF("id").repartition(1))
    val q2 = spark.readStream.table("gmb4.db.t")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("id").collect().map(_.getLong(0)).toSeq.sorted
        ()
      }
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(batches.flatten.sorted === (0L to 12L))
  }

  test("stream offsets: json round-trip and legacy bare-long checkpoints") {
    import graft.streaming.GraftStreamOffset
    val o = GraftStreamOffset(42L, 7L, scanAll = true)
    assert(GraftStreamOffset.fromJson(o.json()) === o)
    val plain = GraftStreamOffset(99L)
    assert(GraftStreamOffset.fromJson(plain.json()) === plain)
    // pre-file-index checkpoints stored the bare snapshot id
    assert(GraftStreamOffset.fromJson("12345") === GraftStreamOffset(12345L))
    assert(GraftStreamOffset.fromJson("-1") === GraftStreamOffset(-1L))
  }

  test("DSv2 micro-batch maps old files through renamed schemas") {
    val base = Files.createTempDirectory("graft-mbs-").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gmb2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmb2.warehouse", s"$base/wh")
    val t = IceTable.create(spark, s"$base/wh/db/t",
      Schema.fresh(Seq((1L, "x")).toDF("id", "name").schema))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.updateSchema(_.renameColumn("name", "label"))
    t.append(Seq((3L, "c")).toDF("id", "label"))

    val q = spark.readStream.table("gmb2.db.t")
      .writeStream.format("memory").queryName("mbs_ren")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("mbs_ren").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("streaming source schema matches the table") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val t = IceTable.create(spark, s"$base/t", Schema.fresh(orders.schema))
    val stream = spark.readStream.format("graft-stream")
      .option("path", s"$base/t").load()
    assert(stream.schema === t.schema.struct)
    assert(stream.isStreaming)
  }

  test("CDC stream (read-changes): inserts and deletes flow as changelog rows") {
    import graft.table.Changelog
    val base = Files.createTempDirectory("graft-cdc-").toString
    val srcLoc = s"$base/src"; val dstLoc = s"$base/dst"; val cp = s"$base/cp"
    import spark.implicits._
    val src = IceTable.create(spark,
      srcLoc, Schema.fresh(Seq((1L, "x")).toDF("k", "v").schema),
      properties = Map(graft.meta.model.TableProperties.DeleteMode ->
        graft.meta.model.TableProperties.RowLevelMergeOnRead))
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))

    // stream schema = table columns + change metadata
    val stream = spark.readStream.format("graft-stream").option("path", srcLoc)
      .option("read-changes", "true").load()
    assert(stream.schema.fieldNames.toSeq ===
      Seq("k", "v", Changelog.ChangeTypeCol, Changelog.SnapshotIdCol,
        Changelog.OrdinalCol))

    // sink: a graft table shaped like the changelog (memory sink cannot
    // resume from a checkpoint across restarts)
    val dst = IceTable.create(spark, dstLoc, Schema.fresh(stream.schema))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-stream").option("path", srcLoc)
        .option("read-changes", "true").load()
        .writeStream.format("graft-stream").option("path", dstLoc)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    runOnce() // initial replay: 3 inserts
    def rowsNow = dst.toDF.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rowsNow.toSet === Set((1L, "a", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert")))

    // a MoR delete + an append, in new commits → next batch carries exactly
    // the delta: one delete row and one insert row
    src.delete(graft.meta.expr.Exprs.equalTo("k", 2L))
    src.append(Seq((4L, "d")).toDF("k", "v"))
    runOnce()
    assert(rowsNow.size === 5)
    assert(rowsNow.count(_._3 == "delete") === 1)
    assert(rowsNow.filter(_._3 == "delete").head._1 === 2L)
    assert(rowsNow.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // no new commits: restart moves nothing (offset checkpointing)
    runOnce()
    assert(rowsNow.size === 5)
  }

  test("CDC stream honors Trigger.AvailableNow natively (no fallback warning)") {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val base = Files.createTempDirectory("graft-cdc3-").toString
    val srcLoc = s"$base/src"
    import spark.implicits._
    val src = IceTable.create(spark, srcLoc,
      Schema.fresh(Seq((1L, "x")).toDF("k", "v").schema))
    src.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // capture every WARN+ log line while the query drains: a source without
    // native support makes MicroBatchExecution log "... does not support
    // Trigger.AvailableNow. Falling back to single batch execution"
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val appender = new AbstractAppender("graft-an-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val q = spark.readStream.format("graft-stream").option("path", srcLoc)
        .option("read-changes", "true").load()
        .writeStream.format("memory").queryName("cdc_an")
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    } finally {
      rootCfg.removeAppender("graft-an-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    // the stream drained the full changelog...
    assert(spark.table("cdc_an").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === Set((1L, "a"), (2L, "b")))
    // ...through the NATIVE AvailableNow path, not the single-batch fallback
    import scala.jdk.CollectionConverters._
    val fallback = captured.asScala
      .filter(_.contains("does not support Trigger.AvailableNow"))
    assert(fallback.isEmpty, s"fallback warning logged: $fallback")
  }

  test("CDC stream starts after starting-snapshot-id (no history replay)") {
    val base = Files.createTempDirectory("graft-cdc2-").toString
    val srcLoc = s"$base/src"
    import spark.implicits._
    val src = IceTable.create(spark, srcLoc,
      Schema.fresh(Seq((1L, "x")).toDF("k", "v").schema))
    src.append(Seq((1L, "a")).toDF("k", "v"))
    val bootSnap = src.currentSnapshot.get.snapshotId
    src.append(Seq((2L, "b")).toDF("k", "v"))
    val q = spark.readStream.format("graft-stream").option("path", srcLoc)
      .option("read-changes", "true")
      .option("starting-snapshot-id", bootSnap.toString).load()
      .writeStream.format("memory").queryName("cdc_boot")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("cdc_boot").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((2L, "b"))) // only the post-boot commit
  }
}
