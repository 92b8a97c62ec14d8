package graft

import graft.table.{IceTable, IncrementalView}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incrementally-maintained aggregate views: every refresh outcome must be
  * indistinguishable from a full recompute of the source's current
  * snapshot — that invariant is asserted after every operation here,
  * including non-invertible aggregates (min under deletes), group
  * disappearance, crash-window reruns, and the rebuild fallbacks. */
class IncrementalViewSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$n").toString

  private val keys = Seq("k")
  private val aggs = Seq("count(*) AS n", "sum(v) AS total", "min(v) AS lo")

  private def fullRecompute(source: IceTable) =
    source.toDF.groupBy("k")
      .agg(expr("count(*) AS n"), expr("sum(v) AS total"), expr("min(v) AS lo"))

  private def assertMatchesFull(view: IceTable, source: IceTable): Unit = {
    val v = view.toDF.select("k", "n", "total", "lo")
    val f = fullRecompute(source)
    assert(v.exceptAll(f).isEmpty && f.exceptAll(v).isEmpty,
      s"view diverged from full recompute:\nview=${v.collect().toSeq}" +
        s"\nfull=${f.collect().toSeq}")
  }

  test("append-only refresh touches only changed groups; values exact") {
    val src = IceTable.create(spark, tmp("src1"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema))
    src.append(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0), (3L, 7.0)).toDF("k", "v"))
    val loc = tmp("view1")
    val view = IncrementalView.create(spark, src, loc, keys, aggs)
    assertMatchesFull(view, src)

    src.append(Seq((2L, 1.0), (4L, 9.0)).toDF("k", "v"))
    val r = IncrementalView.refresh(spark, loc)
    assert(!r.rebuilt)
    assert(r.upsertedGroups === 2, "only groups 2 and 4 changed")
    assert(r.deletedGroups === 0)
    assertMatchesFull(r.view, src)
    // untouched group rows were not rewritten: group 1 keeps count 2
    assert(r.view.toDF.filter(col("k") === 1).head().getAs[Long]("n") === 2L)
  }

  test("deletes: non-invertible min recomputes; vanished groups drop out") {
    val src = IceTable.create(spark, tmp("src2"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema))
    src.append(Seq((1L, 1.0), (1L, 4.0), (2L, 5.0), (3L, 7.0)).toDF("k", "v"))
    val loc = tmp("view2")
    IncrementalView.create(spark, src, loc, keys, aggs)

    // delete group 1's MIN row (min must climb — a delta patch can't know
    // the new min without rescanning the group) and ALL of group 3
    src.delete(graft.meta.expr.Exprs.or(
      graft.meta.expr.Exprs.and(
        graft.meta.expr.Exprs.equalTo("k", 1L),
        graft.meta.expr.Exprs.lessThan("v", 2.0)),
      graft.meta.expr.Exprs.equalTo("k", 3L)))
    val r = IncrementalView.refresh(spark, loc)
    assert(!r.rebuilt)
    assert(r.deletedGroups === 1, "group 3 vanished")
    assertMatchesFull(r.view, src)
    assert(r.view.toDF.filter(col("k") === 1).head().getAs[Double]("lo") === 4.0)
    assert(r.view.toDF.filter(col("k") === 3).count() === 0)
  }

  test("no-op refresh advances nothing; unrelated-commit refresh is cheap") {
    val src = IceTable.create(spark, tmp("src3"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema))
    src.append(Seq((1L, 1.0)).toDF("k", "v"))
    val loc = tmp("view3")
    IncrementalView.create(spark, src, loc, keys, aggs)
    val r = IncrementalView.refresh(spark, loc)
    assert(!r.rebuilt && r.upsertedGroups === 0 && r.deletedGroups === 0)
  }

  test("crash window between MERGE and watermark: rerun converges") {
    val src = IceTable.create(spark, tmp("src4"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema))
    src.append(Seq((1L, 1.0), (2L, 3.0)).toDF("k", "v"))
    val loc = tmp("view4")
    val view = IncrementalView.create(spark, src, loc, keys, aggs)
    val recorded = view.meta.properties(IncrementalView.SourceSnapProp)
    src.append(Seq((1L, 9.0)).toDF("k", "v"))
    IncrementalView.refresh(spark, loc)
    // simulate the crash: force the watermark BACK so the next refresh
    // replays the already-applied delta
    IceTable.load(spark, loc).updateProperties(
      Map(IncrementalView.SourceSnapProp -> recorded))
    val rerun = IncrementalView.refresh(spark, loc)
    assert(!rerun.rebuilt)
    assertMatchesFull(rerun.view, src)
    assert(rerun.view.toDF.filter(col("k") === 1).count() === 1,
      "replayed upsert must not duplicate the group row")
  }

  test("expired watermark falls back to an atomic rebuild") {
    val src = IceTable.create(spark, tmp("src5"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema),
      properties = Map("history.expire.min-snapshots-to-keep" -> "1"))
    src.append(Seq((1L, 1.0)).toDF("k", "v"))
    val loc = tmp("view5")
    IncrementalView.create(spark, src, loc, keys, aggs)
    src.append(Seq((2L, 2.0)).toDF("k", "v"))
    src.append(Seq((3L, 3.0)).toDF("k", "v"))
    // expire everything before the current snapshot — the changelog range
    // (recorded, current] can no longer be walked
    graft.table.Maintenance.expireSnapshots(src,
      olderThanMillis = System.currentTimeMillis() + 60000L)
    val r = IncrementalView.refresh(spark, loc)
    assert(r.rebuilt, "expired watermark must rebuild")
    assertMatchesFull(r.view, src)
    // and the rebuilt view keeps refreshing incrementally afterwards
    src.append(Seq((1L, 5.0)).toDF("k", "v"))
    val r2 = IncrementalView.refresh(spark, loc)
    assert(!r2.rebuilt)
    assertMatchesFull(r2.view, src)
  }

  test("null group keys fall back to rebuild (MERGE cannot address them)") {
    val src = IceTable.create(spark, tmp("src6"),
      graft.meta.Schema.fresh(Seq((Option(1L), 1.0)).toDF("k", "v").schema))
    src.append(Seq((Option(1L), 1.0), (Option(2L), 3.0)).toDF("k", "v"))
    val loc = tmp("view6")
    IncrementalView.create(spark, src, loc, keys, aggs)
    src.append(Seq((Option.empty[Long], 8.0)).toDF("k", "v"))
    val r = IncrementalView.refresh(spark, loc)
    assert(r.rebuilt)
    assertMatchesFull(r.view, src)
  }

  test("create refuses unaliased aggregates and empty sources loudly") {
    val src = IceTable.create(spark, tmp("src7"),
      graft.meta.Schema.fresh(Seq((1L, 1.0)).toDF("k", "v").schema))
    val e1 = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, src, tmp("v7a"), keys, Seq("sum(v)"))
    }
    assert(e1.getMessage.contains("alias"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalView.create(spark, src, tmp("v7b"), keys, aggs)
    }
    assert(e2.getMessage.contains("no snapshot"))
  }
}
