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

  test("streaming source schema matches the table") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val t = IceTable.create(spark, s"$base/t", Schema.fresh(orders.schema))
    val stream = spark.readStream.format("graft-stream")
      .option("path", s"$base/t").load()
    assert(stream.schema === t.schema.struct)
    assert(stream.isStreaming)
  }
}
