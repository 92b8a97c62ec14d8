package graft

import graft.operators.TemporalJoins

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range joins — composed operators whose value is the PLAN:
  * the naive formulations (non-equi join conditions) drop Spark into
  * BroadcastNestedLoopJoin, so these specs pin both the values (vs
  * brute-force twins) and the physical shape (no nested-loop node). */
class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("asof backward: latest at-or-before per key, ties match, miss is null") {
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "c", 7L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("a", 25L, 3.0),
      ("b", 9L, 4.0)).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"))
      .orderBy("id").collect()
    // id=1: tie at t=10 matches v=1.0; id=2: rt=15 is latest <= 20;
    // id=3: b's only row is at 9 > 5 -> null; id=4: no c rows -> null
    assert(out.map(r => (r.getLong(0), Option(r.get(4)))).toSeq === Seq(
      (1L, Some(1.0)), (2L, Some(2.0)), (3L, None), (4L, None)))
    // matched right time rides along
    assert(out(1).getAs[Long]("rt") === 15L)
  }

  test("asof forward and tolerance") {
    val left = Seq((1L, 10L), (2L, 16L), (3L, 30L)).toDF("id", "t")
      .withColumn("k", lit("x"))
    val right = Seq(10L -> 1.0, 20L -> 2.0).toDF("rt", "v")
      .withColumn("k", lit("x"))
    val fwd = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"),
      direction = "forward").orderBy("id").collect()
    assert(fwd.map(r => Option(r.get(4))).toSeq ===
      Seq(Some(1.0), Some(2.0), None))
    val tol = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"),
      tolerance = Some(8L)).orderBy("id").collect()
    // id=2 at 16 -> rt=10, |16-10| = 6 <= 8 keeps; id=3 at 30 -> rt=20,
    // |30-20| = 10 > 8 cuts to null
    assert(tol.map(r => Option(r.get(4))).toSeq ===
      Seq(Some(1.0), Some(1.0), None))
  }

  test("asof plan: one exchange, no nested-loop join anywhere") {
    val left = spark.range(1000).select(col("id"),
      (col("id") % 7).as("k"), (col("id") * 3).as("t"))
    val right = spark.range(500).select((col("id") % 7).as("k"),
      (col("id") * 5).as("rt"), col("id").cast("double").as("v"))
    val out = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"))
    val plan = physical(out)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"as-of must never nested-loop:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "as-of is a window composition — no join node expected")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one exchange:\n$plan")
  }

  test("asof matches a brute-force twin on random keyed data") {
    val left = spark.range(2000).select(col("id"),
      (col("id") % 13).as("k"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("t"))
    val right = spark.range(700).select((col("id") % 13).as("k"),
      pmod(hash(col("id") + 9999), lit(1000)).cast("long").as("rt"),
      col("id").cast("double").as("v"))
    val ours = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"))
      .select("id", "rt", "v")
    // brute force: max rt <= t per left row, then its value (unique rt per
    // (k, rt) is not guaranteed from hashing -> aggregate right first)
    val r2 = right.groupBy("k", "rt").agg(max("v").as("v"))
    val ours2 = TemporalJoins.asofJoin(left, r2, "t", "rt", Seq("k"))
      .select("id", "rt", "v")
    val brute = left.as("l").join(r2.as("r"),
        col("l.k") === col("r.k") && col("r.rt") <= col("l.t"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l.id").orderBy(col("r.rt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.id"), col("r.rt"), col("r.v"))
    assert(ours2.exceptAll(brute).isEmpty && brute.exceptAll(ours2).isEmpty,
      "as-of join disagrees with brute force")
    assert(ours.count() === left.count(), "left outer must preserve all rows")
  }

  test("asof bucketed variant is row-identical to the window path") {
    // unique (k, rt) pairs so the match is deterministic across plans
    val left = spark.range(4000).select(col("id"),
      (col("id") % 7).as("k"),
      pmod(hash(col("id")), lit(5000)).cast("long").as("t"))
    val right = spark.range(1500)
      .select((col("id") % 7).as("k"),
        pmod(hash(col("id") + 424242), lit(5000)).cast("long").as("rt"),
        col("id").cast("double").as("v"))
      .groupBy("k", "rt").agg(max("v").as("v"))
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(40L));
         width <- Seq(1L, 7L, 100L, 100000L)) {
      val base = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"),
        direction = dir, tolerance = tol).orderBy("id")
      val bucketed = TemporalJoins.asofJoin(left, right, "t", "rt", Seq("k"),
        direction = dir, tolerance = tol, bucketWidth = Some(width))
        .orderBy("id")
      assert(bucketed.collect().toSeq === base.collect().toSeq,
        s"bucketed asof diverges (dir=$dir tol=$tol width=$width)")
    }
    // hot-key fuzz: ONE key carries everything (the shape the option is
    // for) and buckets smaller than typical spacing leave empty buckets
    // between carries
    val hotL = spark.range(3000).select(col("id"), lit(1L).as("k"),
      (col("id") * 17).as("t"))
    val hotR = spark.range(200).select(lit(1L).as("k"),
      (col("id") * 251 + 3).as("rt"), col("id").cast("double").as("v"))
    val hb = TemporalJoins.asofJoin(hotL, hotR, "t", "rt", Seq("k")).orderBy("id")
    val hbB = TemporalJoins.asofJoin(hotL, hotR, "t", "rt", Seq("k"),
      bucketWidth = Some(97L)).orderBy("id")
    assert(hbB.collect().toSeq === hb.collect().toSeq,
      "hot-key bucketed asof diverges")
    // negative times: truncating `div` buckets must not lose carries
    val negL = spark.range(500).select(col("id"), lit(1L).as("k"),
      (col("id") * 13 - 3000).as("t"))
    val negR = spark.range(100).select(lit(1L).as("k"),
      (col("id") * 61 - 2999).as("rt"), col("id").cast("double").as("v"))
    val nb = TemporalJoins.asofJoin(negL, negR, "t", "rt", Seq("k"),
      direction = "forward").orderBy("id")
    val nbB = TemporalJoins.asofJoin(negL, negR, "t", "rt", Seq("k"),
      direction = "forward", bucketWidth = Some(100L)).orderBy("id")
    assert(nbB.collect().toSeq === nb.collect().toSeq,
      "negative-epoch bucketed asof diverges")
  }

  test("range join matches brute force; multi-cell intervals match once") {
    val points = spark.range(3000).select(col("id"),
      (col("id") % 5).as("k"),
      pmod(hash(col("id")), lit(10000)).cast("long").as("p"))
    // interval lengths up to ~2000 span many 128-wide cells
    val ivs = spark.range(200).select((col("id") % 5).as("k"),
      pmod(hash(col("id") * 7), lit(9000)).cast("long").as("s"))
      .withColumn("e", col("s") + pmod(hash(col("s")), lit(2000)))
      .withColumn("iv_id", monotonically_increasing_id())
    val ours = TemporalJoins.rangeJoin(points, ivs, "p", "s", "e",
      keys = Seq("k"), bucketWidth = 128L)
    val brute = points.join(ivs, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select(points.columns.map(col) ++ Seq(col("s"), col("e"), col("iv_id")): _*)
    assert(ours.count() > 0, "fixture should produce matches")
    assert(ours.exceptAll(brute).isEmpty && brute.exceptAll(ours).isEmpty,
      "range join disagrees with brute force (duplicates count)")
    val plan = physical(ours)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must never nested-loop:\n$plan")
  }

  test("range join: inverted intervals match nothing; cells cap is loud") {
    val points = Seq((1L, 50L)).toDF("id", "p")
    val inverted = Seq((100L, 10L)).toDF("s", "e")
    assert(TemporalJoins.rangeJoin(points, inverted, "p", "s", "e",
      bucketWidth = 10L).count() === 0)
    val huge = Seq((0L, 10000000L)).toDF("s", "e")
    val e = intercept[Exception] {
      TemporalJoins.rangeJoin(points, huge, "p", "s", "e",
        bucketWidth = 1L, maxCellsPerInterval = 1000L).count()
    }
    assert(e.getMessage != null)
    // name collisions refuse up front, not last-writer-wins
    val bad = Seq((1L, 2L, 3L)).toDF("p", "s", "e")
    val err = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(points, bad, "p", "s", "e", bucketWidth = 10L)
    }
    assert(err.getMessage.contains("collide"))
  }
}
