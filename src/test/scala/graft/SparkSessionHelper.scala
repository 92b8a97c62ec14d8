package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap re-use, UTC, small shuffle). */
object SparkSessionHelper {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // breadcrumb for Bench's contamination detector ("preceded_by" field):
    // records that a test JVM was busy on this machine and when — stamped
    // at session creation AND at JVM exit (the exit stamp is what catches
    // "bench started minutes after a 16-minute suite finished")
    markTestRun()
    Runtime.getRuntime.addShutdownHook(new Thread(() => markTestRun()))
    s
  }

  /** Touch the shared last-test-run marker (also refreshed when the session
    * is created, so any suite run leaves a trace even if it crashes). */
  def markTestRun(): Unit =
    try {
      val p = java.nio.file.Paths.get("target", ".graft-last-test-run")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        System.currentTimeMillis().toString.getBytes("UTF-8"))
    } catch { case _: Exception => () }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
