package graft

import graft.meta.expr.Exprs
import graft.table.{IceTable, Listeners}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 catalog: SQL reads must go through the same pruning cascade as the
  * Scala scan API (VERDICT r1 gap #1). */
class CatalogSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHelper.spark
  private lazy val warehouse = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gr", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gr.warehouse", dir)
    dir
  }
  private lazy val lineitem =
    spark.read.parquet(s"${SparkSessionHelper.sf0001}/lineitem.parquet")

  test("create/insert/select through SQL") {
    warehouse
    spark.sql("CREATE TABLE gr.db.t1 (id BIGINT, name STRING, qty DOUBLE) PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gr.db.t1 VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', 3.5)")
    val rows = spark.sql("SELECT id, name, qty FROM gr.db.t1 ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    // the physical table is a real graft table
    val t = IceTable.load(spark, s"$warehouse/db/t1")
    assert(t.currentSnapshot.isDefined)
    assert(t.spec.isPartitioned)
  }

  test("system functions: partition transforms callable from SQL, byte-exact") {
    warehouse
    import graft.meta.transforms.TransformEval
    val r = spark.sql(
      "SELECT gr.system.bucket(8, CAST(42 AS BIGINT)) b, " +
        "gr.system.bucket(16, 'graft') bs, " +
        "gr.system.truncate(10, 47) t, " +
        "gr.system.truncate(3, 'transform') ts, " +
        "gr.system.years(DATE '2021-03-04') y, " +
        "gr.system.months(DATE '2021-03-04') m, " +
        "gr.system.days(TIMESTAMP '2021-03-04 05:06:07') d, " +
        "gr.system.hours(TIMESTAMP '2021-03-04 05:06:07') h").head()
    assert(r.getInt(0) === TransformEval.bucketLong(8, 42L))
    assert(r.getInt(1) === TransformEval.bucketUtf8(16,
      org.apache.spark.unsafe.types.UTF8String.fromString("graft")))
    assert(r.getInt(2) === 40)
    assert(r.getString(3) === "tra")
    assert(r.getInt(4) === 51) // 2021 - 1970
    assert(r.getInt(5) === 51 * 12 + 2)
    assert(r.getInt(6) === java.time.LocalDate.of(2021, 3, 4).toEpochDay.toInt)
    assert(r.getInt(7) === TransformEval.hoursFromMicros(
      java.time.Instant.parse("2021-03-04T05:06:07Z").toEpochMilli * 1000L))
    // null-safe, and the SQL surface agrees with a written table's routing
    assert(spark.sql("SELECT gr.system.bucket(8, CAST(NULL AS BIGINT)) n")
      .head().isNullAt(0))
    // agrees with the Column-API expression surface on real data
    val ids = spark.range(200).toDF("id")
    ids.createOrReplaceTempView("fn_ids")
    val viaSql = spark.sql("SELECT id, gr.system.bucket(7, id) AS b FROM fn_ids")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = ids.select(col("id"),
        graft.functions.ice_bucket(7, col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql === viaCol)
    // the MAGIC `invoke` path plans as a codegen'd Invoke, not the
    // row-boxing ApplyFunctionExpression fallback
    val plan = org.apache.spark.sql.graft.ColumnBridge.executedPlan(
      spark.sql("SELECT gr.system.bucket(7, id) AS b FROM fn_ids")).toString
    assert(!plan.toLowerCase.contains("applyfunction"),
      s"magic invoke not used:\n$plan")
  }

  test("system functions: NULL reference-typed column values through magic invoke") {
    warehouse
    import spark.implicits._
    // Invoke only auto-null-checks primitive args, so null UTF8String /
    // Array[Byte] / Decimal inputs must be handled inside the functions —
    // values come from a real column (a NULL literal folds before Invoke)
    Seq(("a", Some("graft"), Some(BigDecimal("12.30"))),
        ("b", None, None))
      .toDF("k", "s", "dec")
      .withColumn("dec", col("dec").cast("decimal(9,2)"))
      .withColumn("bin", encode(col("s"), "UTF-8"))
      .createOrReplaceTempView("fn_nulls")
    val rows = spark.sql(
      """SELECT k, gr.system.bucket(16, s) bs, gr.system.bucket(16, bin) bb,
        |  gr.system.bucket(16, dec) bd, gr.system.truncate(3, s) ts,
        |  gr.system.truncate(2, bin) tb, gr.system.truncate(10, dec) td
        |FROM fn_nulls ORDER BY k""".stripMargin).collect()
    assert(rows(0).toSeq.drop(1).forall(_ != null), s"row a: ${rows(0)}")
    assert(rows(0).getString(4) === "gra")
    assert((1 to 6).forall(rows(1).isNullAt), s"row b should be all null: ${rows(1)}")
  }

  test("catalog table cache reuses the handle and never serves stale metadata") {
    warehouse
    spark.sql("CREATE TABLE gr.db.cached (id BIGINT)")
    val cat = spark.sessionState.catalogManager.catalog("gr")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "cached")
    def ice() = cat.loadTable(ident).asInstanceOf[graft.spark.GraftSparkTable].table
    val h = ice()
    assert(ice() eq h, "second load must reuse the cached IceTable")
    // the cached handle re-reads the versioned pointer per access, so a
    // commit through a DIFFERENT handle is visible immediately — the cache
    // skips the JSON re-parse, not the staleness check
    IceTable.load(spark, s"$warehouse/db/cached")
      .append(spark.range(5).toDF("id"))
    assert(spark.sql("SELECT count(*) c FROM gr.db.cached").head().getLong(0) === 5L)
    spark.sql("DROP TABLE gr.db.cached")
    spark.sql("CREATE TABLE gr.db.cached (id BIGINT)")
    assert(ice() ne h, "drop must evict the cached handle")
    assert(spark.sql("SELECT count(*) c FROM gr.db.cached").head().getLong(0) === 0L)
  }

  test("SHOW FUNCTIONS in an existing data namespace does not throw") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gr.fndb")
    // contract: only a MISSING namespace raises NoSuchNamespaceException
    assert(spark.sql("SHOW FUNCTIONS IN gr.fndb").collect() != null)
    intercept[Exception] { spark.sql("SHOW FUNCTIONS IN gr.no_such_db").collect() }
  }

  test("SQL read goes through the pruning cascade (ScanEvent file counts match Scala path)") {
    warehouse
    val t = IceTable.create(spark, s"$warehouse/db/t2",
      graft.meta.Schema.fresh(lineitem.schema),
      graft.meta.PartitionSpec.builderFor(graft.meta.Schema.fresh(lineitem.schema))
        .identity("l_returnflag").build())
    t.append(lineitem)
    val totalFiles = t.newScan().planFiles().size
    val scalaCount = t.newScan().filter(Exprs.equalTo("l_returnflag", "R")).planFiles().size
    assert(scalaCount < totalFiles, "identity partition should prune files")

    val events = scala.collection.mutable.ArrayBuffer[Listeners.ScanEvent]()
    Listeners.register(classOf[Listeners.ScanEvent]) { e =>
      if (e.tableLocation.endsWith("db/t2")) events.synchronized { events += e }
    }
    val sqlRows = spark.sql("SELECT l_orderkey FROM gr.db.t2 WHERE l_returnflag = 'R'").count()
    assert(sqlRows === lineitem.filter(col("l_returnflag") === "R").count())
    val planned = events.synchronized(events.last.plannedFiles)
    assert(planned === scalaCount, "SQL path must prune exactly like the Scala path")
  }

  test("SQL aggregation matches DataFrame on the same data") {
    warehouse
    val got = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM gr.db.t2 GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.get(1)))
    val want = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s")).orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.get(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("count(*) works with empty projection pushdown") {
    warehouse
    assert(spark.sql("SELECT count(*) FROM gr.db.t2").head().getLong(0) === lineitem.count())
  }

  test("INSERT OVERWRITE truncates and replaces") {
    warehouse
    spark.sql("CREATE TABLE gr.db.t3 (k INT, v STRING)")
    spark.sql("INSERT INTO gr.db.t3 VALUES (1, 'old'), (2, 'old')")
    spark.sql("INSERT OVERWRITE gr.db.t3 VALUES (9, 'new')")
    val rows = spark.sql("SELECT k, v FROM gr.db.t3").collect()
    assert(rows.length === 1 && rows.head.getInt(0) === 9)
    // history preserved: previous snapshot still queryable
    val t = IceTable.load(spark, s"$warehouse/db/t3")
    assert(t.snapshots.size >= 2)
  }

  test("time travel via VERSION AS OF") {
    warehouse
    spark.sql("CREATE TABLE gr.db.t4 (k INT)")
    spark.sql("INSERT INTO gr.db.t4 VALUES (1)")
    val t = IceTable.load(spark, s"$warehouse/db/t4")
    val v1 = t.currentSnapshot.get.snapshotId
    spark.sql("INSERT INTO gr.db.t4 VALUES (2)")
    assert(spark.sql(s"SELECT count(*) FROM gr.db.t4 VERSION AS OF $v1").head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM gr.db.t4").head().getLong(0) === 2L)
  }

  test("read options: snapshot-id time travel and split-size task sizing") {
    warehouse
    spark.sql("CREATE TABLE gr.db.ropt (k INT)")
    spark.sql("INSERT INTO gr.db.ropt SELECT id FROM range(20000)")
    val t = IceTable.load(spark, s"$warehouse/db/ropt")
    val v1 = t.currentSnapshot.get.snapshotId
    spark.sql("INSERT INTO gr.db.ropt VALUES (-1)")
    // snapshot-id option reads the old snapshot (ref SparkReadOptions)
    assert(spark.read.option("snapshot-id", v1).table("gr.db.ropt").count() === 20000L)
    assert(spark.read.table("gr.db.ropt").count() === 20001L)
    // as-of-timestamp behaves the same way
    val ts1 = t.meta.snapshot(v1).get.timestampMillis
    assert(spark.read.option("as-of-timestamp", ts1).table("gr.db.ropt")
      .count() === 20000L)
    // split-size shrinks per-task bytes → more partitions than the default read
    val defaultParts = spark.read.table("gr.db.ropt").rdd.getNumPartitions
    val smallParts = spark.read.option("split-size", 8 * 1024)
      .table("gr.db.ropt").rdd.getNumPartitions
    assert(smallParts > defaultParts)
  }

  test("write option write-format overrides the table default per append") {
    warehouse
    spark.sql("CREATE TABLE gr.db.wopt (k INT)")
    spark.sql("INSERT INTO gr.db.wopt VALUES (1)") // table default: parquet
    spark.range(2, 4).selectExpr("cast(id as int) as k")
      .writeTo("gr.db.wopt").option("write-format", "orc").append()
    val t = IceTable.load(spark, s"$warehouse/db/wopt")
    assert(t.newScan().planFiles().map(_.file.format).toSet === Set("parquet", "orc"))
    assert(spark.sql("SELECT sum(k) FROM gr.db.wopt").head().getLong(0) === 6L)
  }

  test("ALTER TABLE add/rename column and properties") {
    warehouse
    spark.sql("CREATE TABLE gr.db.t5 (k INT, v STRING)")
    spark.sql("INSERT INTO gr.db.t5 VALUES (1, 'x')")
    spark.sql("ALTER TABLE gr.db.t5 ADD COLUMN extra DOUBLE")
    spark.sql("ALTER TABLE gr.db.t5 RENAME COLUMN v TO label")
    spark.sql("ALTER TABLE gr.db.t5 SET TBLPROPERTIES ('write.distribution-mode' = 'none')")
    val row = spark.sql("SELECT k, label, extra FROM gr.db.t5").head()
    assert(row.getInt(0) === 1 && row.getString(1) === "x" && row.isNullAt(2))
    val t = IceTable.load(spark, s"$warehouse/db/t5")
    assert(t.meta.properties("write.distribution-mode") === "none")
  }

  test("DROP NAMESPACE without CASCADE refuses a non-empty namespace") {
    warehouse
    spark.sql("CREATE TABLE gr.ns1.keep (k INT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE gr.ns1") }
    assert(spark.sql("SELECT count(*) FROM gr.ns1.keep").head().getLong(0) === 0L)
    spark.sql("DROP NAMESPACE gr.ns1 CASCADE")
    assert(!IceTable.exists(spark, s"$warehouse/ns1/keep"))
  }

  test("ALTER TABLE RENAME moves the table and fails cleanly") {
    warehouse
    spark.sql("CREATE TABLE gr.db.ren1 (k INT)")
    spark.sql("INSERT INTO gr.db.ren1 VALUES (7)")
    spark.sql("ALTER TABLE gr.db.ren1 RENAME TO db.ren2")
    assert(spark.sql("SELECT k FROM gr.db.ren2").head().getInt(0) === 7)
    assert(!IceTable.exists(spark, s"$warehouse/db/ren1"))
  }

  test("metadata tables resolve as SQL identifiers (t.snapshots, t.files)") {
    warehouse
    spark.sql("CREATE TABLE gr.db.meta1 (k INT)")
    spark.sql("INSERT INTO gr.db.meta1 VALUES (1), (2)")
    spark.sql("INSERT INTO gr.db.meta1 VALUES (3)")
    val t = IceTable.load(spark, s"$warehouse/db/meta1")
    assert(spark.sql("SELECT * FROM gr.db.meta1.snapshots").count() ===
      t.metadataTable("snapshots").count())
    assert(spark.sql("SELECT * FROM gr.db.meta1.files").count() ===
      t.metadataTable("files").count())
    assert(spark.sql("SELECT * FROM gr.db.meta1.history").count() === 2L)
    // snapshot ids line up with the Scala API
    val sqlIds = spark.sql("SELECT snapshot_id FROM gr.db.meta1.snapshots")
      .collect().map(_.getLong(0)).toSet
    assert(sqlIds === t.snapshots.map(_.snapshotId).toSet)
  }

  test("CTAS is atomic: success publishes, failure leaves no table") {
    warehouse
    spark.sql("CREATE TABLE gr.db.ctas1 AS SELECT 1 AS k, 'a' AS v")
    assert(spark.sql("SELECT k, v FROM gr.db.ctas1").head().getInt(0) === 1)
    // failing source query: no table (and no stray staging table) left behind
    intercept[Exception] {
      spark.sql("CREATE TABLE gr.db.ctas2 AS SELECT assert_true(false, 'boom') AS k")
    }
    assert(!IceTable.exists(spark, s"$warehouse/db/ctas2"))
    assert(!spark.sql("SHOW TABLES IN gr.db").collect()
      .map(_.getString(1)).exists(_.contains("ctas2")))
    // RTAS atomically swaps
    spark.sql("REPLACE TABLE gr.db.ctas1 AS SELECT 9 AS k")
    assert(spark.sql("SELECT k FROM gr.db.ctas1").head().getInt(0) === 9)
  }

  test("session catalog extension routes USING graft tables, delegates the rest") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sess-").toString
    val s = org.apache.spark.sql.graft.ColumnBridge.cloneSession(spark)
    s.conf.set("spark.sql.catalog.spark_catalog", "graft.spark.GraftSessionCatalog")
    s.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
    s.sql("CREATE DATABASE IF NOT EXISTS gsdb")
    try {
      s.sql("CREATE TABLE gsdb.gt (k INT) USING graft")
      s.sql("INSERT INTO gsdb.gt VALUES (1), (2)")
      assert(s.sql("SELECT count(*) FROM gsdb.gt").head().getLong(0) === 2L)
      // physically a graft table in the configured warehouse
      val t = IceTable.load(s, s"$wh/gsdb/gt")
      assert(t.toDF.count() === 2)
      // row-level SQL works through the session catalog too
      s.sql("DELETE FROM gsdb.gt WHERE k = 1")
      assert(s.sql("SELECT k FROM gsdb.gt").head().getInt(0) === 2)
      // non-graft tables delegate to the built-in session catalog
      s.sql("CREATE TABLE gsdb.pt (k INT) USING parquet")
      s.sql("INSERT INTO gsdb.pt VALUES (5)")
      assert(s.sql("SELECT k FROM gsdb.pt").head().getInt(0) === 5)
      assert(!IceTable.exists(s, s"$wh/gsdb/pt"))
    } finally {
      s.sql("DROP TABLE IF EXISTS gsdb.gt")
      s.sql("DROP TABLE IF EXISTS gsdb.pt")
      s.sql("DROP DATABASE IF EXISTS gsdb")
    }
  }

  test("path-based read: spark.read.format(graft).load(location)") {
    warehouse
    spark.sql("CREATE TABLE gr.db.pathread (k INT, v STRING)")
    spark.sql("INSERT INTO gr.db.pathread VALUES (1, 'a'), (2, 'b')")
    val df = spark.read.format("graft").load(s"$warehouse/db/pathread")
    assert(df.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "a"), (2, "b")))
    // filters prune through the same cascade (pushed filter visible in plan)
    val filtered = df.filter(col("k") === 2)
    assert(filtered.count() === 1)
  }

  test("DROP TABLE and listTables") {
    warehouse
    spark.sql("CREATE TABLE gr.db.gone (k INT)")
    assert(spark.sql("SHOW TABLES IN gr.db").collect().map(_.getString(1)).contains("gone"))
    spark.sql("DROP TABLE gr.db.gone")
    assert(!spark.sql("SHOW TABLES IN gr.db").collect().map(_.getString(1)).contains("gone"))
  }
}
