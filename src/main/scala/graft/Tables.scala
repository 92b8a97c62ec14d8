package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects by default; we enable `nanosAsLong` so the column surfaces as a
  * LongType of epoch-nanos (queries that need a timestamp can
  * `timestamp_micros(ts div 1000)` it).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
