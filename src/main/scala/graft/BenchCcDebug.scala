package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic harness that root-caused the llm_cc_dedup bench
  * instability (r11 "What's wrong #1"): runs the exact bench entry N
  * times, reporting per-sample wall time, GC time/count deltas (per
  * collector bean), committed-heap size, and a stage split
  * (pairs+persist+probe / collect+union-find / join+consume).
  *
  * Finding (BASELINE.md §llm_cc_dedup): without `-Xms` the heap was
  * committed lazily and `System.gc()` between bench groups let G1
  * uncommit regions; re-expansion page faults landed INSIDE young-GC
  * pauses (a measured 3.42 s young collection during a 24 G→49 G growth
  * step) — the bimodal slow mode. Fixed by pinning `-Xms` to `-Xmx` +
  * `-XX:+AlwaysPreTouch` (build.sbt). Kept as the adjudication tool for
  * any future sample-spread question; not part of the bench protocol.
  */
object BenchCcDebug {
  private def gcStats(): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => b.getName -> (b.getCollectionCount, b.getCollectionTime)).toMap
  }

  private def consume(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsDf = Tables.load(spark, sfDir, "documents")
    def t0 = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    (1 to n).foreach { i =>
      val g0 = gcStats()
      val tAll = t0
      // stage 1: build pairs frame + persist + probe (this is what
      // connectedComponents does before the small-graph branch)
      val tPairs = t0
      val pairs = graft.llm.Dedup.minHashLshPairs(
        docsDf, "doc_id", "text", 3, 8, 2, 0.6)
      val edges = pairs.select(col("id_a").cast("long").as("u"),
          col("id_b").cast("long").as("v"))
        .where(col("u") =!= col("v")).distinct().persist()
      val cnt = edges.count()
      val sPairs = secs(tPairs)
      // stage 2: collect + driver union-find equivalent
      val tCollect = t0
      val es = edges.collect()
      val sCollect = secs(tCollect)
      edges.unpersist(blocking = true)
      // stage 3: the real entry end-to-end (as the bench runs it)
      val tFull = t0
      consume(graft.llm.Dedup.dedupByComponents(docsDf, "doc_id",
        graft.llm.Dedup.minHashLshPairs(docsDf, "doc_id", "text", 3, 8, 2, 0.6)))
      val sFull = secs(tFull)
      val sAll = secs(tAll)
      val g1 = gcStats()
      val gcDelta = g1.map { case (k, (c, t)) =>
        val (c0, tm0) = g0.getOrElse(k, (0L, 0L))
        f"$k:${c - c0}/${(t - tm0) / 1e3}%.2fs"
      }.mkString(" ")
      println(f"sample $i%2d: all=$sAll%6.3f pairs+probe=$sPairs%6.3f (edges=$cnt) collect=$sCollect%6.3f full_entry=$sFull%6.3f gc[$gcDelta] heap=${Runtime.getRuntime.totalMemory() / (1L << 20)}M used=${(Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / (1L << 20)}M")
      es.length // keep referenced
    }
    spark.stop()
  }
}
