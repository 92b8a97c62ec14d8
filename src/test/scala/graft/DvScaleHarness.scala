package graft

import graft.meta.Schema
import graft.table.{IceTable, Maintenance}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual delete-density measurement: (path, pos) parquet probe join vs
  * roaring deletion vectors on the SAME table and tombstone set (test
  * scope — never ships). Run with
  * `sbt "Test/runMain graft.DvScaleHarness [mult] [deletePct]"` on an idle
  * machine per BASELINE.md's protocol.
  *
  * Inflates sf0.1 lineitem `mult`×, deletes `deletePct`% of rows through
  * merge-on-read position deletes, measures the full native scan, then
  * converts the SAME tombstones to DVs and measures again. The interesting
  * regime is high density: the parquet path's per-scan cost is the delete
  * parquet scan + per-executor sorted-array build (O(deletes) time AND
  * memory as 8 B/position), the DV path's is one ranged bitmap fetch per
  * data file (~2 bits/position at this density).
  */
object DvScaleHarness {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val pct = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val li0 = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val li = li0.crossJoin(spark.range(mult).toDF("_r"))
      .withColumn("l_orderkey", col("l_orderkey") * mult + col("_r"))
      .drop("_r")
    val loc = java.nio.file.Files.createTempDirectory("graft-dvscale-")
      .toString + "/t"
    val t = IceTable.create(spark, loc, Schema.fresh(li.schema))
    println(f"building ${mult}x table...")
    t.append(li.repartition(32))
    val total = t.toDF.count()
    println(s"rows=$total files=" + t.newScan().planFiles().size)

    def scan() = consume(spark.read.format("graft").load(loc))
    (1 to 2).foreach(_ => scan())
    val tClean = (1 to 3).map(_ => time(scan())).min
    println(f"${mult}x clean_read $tClean%.2f s")

    // delete pct% of rows spread across EVERY file (hash of the row key)
    val tDel = time(t.deleteMergeOnRead(
      graft.meta.expr.Exprs.lessThan("l_quantity", pct / 2.0)))
    val m = t.meta.currentSnapshot.get.summary
    val nDeleted = m.getOrElse("added-position-deletes", "?")
    println(f"${mult}x delete($pct%%-ish) $tDel%.1f s tombstones=$nDeleted")
    (1 to 2).foreach(_ => scan())
    val tParquet = (1 to 3).map(_ => time(scan())).min
    println(f"${mult}x mor_read_parquet $tParquet%.2f s")

    val tConv = time(Maintenance.convertPositionDeletes(t))
    val dvs = t.newScan().planDeletes().map(_._1)
    println(f"${mult}x convert $tConv%.1f s dv_blobs=${dvs.size} " +
      f"dv_bytes=${dvs.map(_.contentSize.getOrElse(0L)).sum}")
    (1 to 2).foreach(_ => scan())
    val tDv = (1 to 3).map(_ => time(scan())).min
    println(f"${mult}x mor_read_dv $tDv%.2f s (parquet/dv = ${tParquet / tDv}%.2f x)")
    val after = t.toDF.count()
    println(s"rows after=$after (expect < $total)")
    spark.stop()
  }
}
