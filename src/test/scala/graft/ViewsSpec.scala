package graft

import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewChange}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL views on graft catalogs: Spark 4.1 ships only the ViewCatalog SPI
  * (CREATE VIEW on any non-session catalog throws
  * MISSING_CATALOG_ABILITY and nothing calls loadView) — the parser
  * extension + ResolveGraftViews supply the missing wiring, and
  * graft.table.Views stores versioned view JSON under the table path. */
class ViewsSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private lazy val warehouse = {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_wh").toString
    spark.conf.set("spark.sql.catalog.gv", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv.warehouse", dir)
    spark.sql("CREATE TABLE gv.db.t (k BIGINT, v STRING, nk BIGINT)")
    spark.sql("INSERT INTO gv.db.t SELECT id, concat('v', id), id % 3 FROM range(30)")
    spark.sql("CREATE TABLE gv.db.dim (nk BIGINT, name STRING)")
    spark.sql("INSERT INTO gv.db.dim VALUES (0,'zero'),(1,'one'),(2,'two')")
    dir
  }

  private def vc: ViewCatalog =
    spark.sessionState.catalogManager.catalog("gv").asInstanceOf[ViewCatalog]

  test("CREATE VIEW / SELECT / nested views / DROP round trip") {
    warehouse
    spark.sql("CREATE VIEW gv.db.big AS SELECT k, v FROM gv.db.t WHERE k >= 20")
    assert(spark.sql("SELECT * FROM gv.db.big").count() === 10)
    // joins + aggregates through a view over a view
    spark.sql("CREATE VIEW gv.db.bigjoin AS " +
      "SELECT b.k, d.name FROM gv.db.big b " +
      "JOIN gv.db.dim d ON b.k % 3 = d.nk")
    val rows = spark.sql("SELECT name, count(*) AS n FROM gv.db.bigjoin " +
      "GROUP BY name ORDER BY name").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("one", 3L), ("two", 4L), ("zero", 3L)))
    // plain CREATE on an existing view refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql("CREATE VIEW gv.db.big AS SELECT 1 AS x") }
    spark.sql("CREATE VIEW IF NOT EXISTS gv.db.big AS SELECT 1 AS x")
    assert(spark.sql("SELECT * FROM gv.db.big").columns.toSeq === Seq("k", "v"))
    // DROP: missing refuses unless IF EXISTS; view gone afterwards
    spark.sql("DROP VIEW gv.db.bigjoin")
    intercept[Exception] { spark.sql("DROP VIEW gv.db.bigjoin") }
    spark.sql("DROP VIEW IF EXISTS gv.db.bigjoin")
    intercept[Exception] { spark.sql("SELECT * FROM gv.db.bigjoin").collect() }
    spark.sql("DROP VIEW gv.db.big")
  }

  test("schema pinning: SELECT * views keep their frozen column list") {
    warehouse
    spark.sql("CREATE TABLE gv.db.pin (a BIGINT, b STRING)")
    spark.sql("INSERT INTO gv.db.pin VALUES (1, 'x')")
    spark.sql("CREATE VIEW gv.db.pinview AS SELECT * FROM gv.db.pin")
    spark.sql("ALTER TABLE gv.db.pin ADD COLUMN c DOUBLE")
    spark.sql("INSERT INTO gv.db.pin VALUES (2, 'y', 3.5)")
    // the view's column list froze at creation: no c column leaks in
    val df = spark.sql("SELECT * FROM gv.db.pinview ORDER BY a")
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.count() === 2)
    // OR REPLACE re-captures the wider schema (a new view version)
    spark.sql("CREATE OR REPLACE VIEW gv.db.pinview AS SELECT * FROM gv.db.pin")
    assert(spark.sql("SELECT * FROM gv.db.pinview").columns.toSeq ===
      Seq("a", "b", "c"))
  }

  test("ViewCatalog API: exists/list/alter/rename; tables and views disjoint") {
    warehouse
    spark.sql("CREATE VIEW gv.db.apiview AS SELECT k FROM gv.db.t")
    val id = Identifier.of(Array("db"), "apiview")
    assert(vc.viewExists(id))
    assert(!vc.viewExists(Identifier.of(Array("db"), "t")))
    // tables don't list as views and vice versa
    val views = vc.listViews("db").map(_.name()).toSet
    assert(views.contains("apiview") && !views.contains("t"))
    val tables = spark.sql("SHOW TABLES IN gv.db").collect()
      .map(_.getString(1)).toSet
    assert(!tables.contains("apiview"), s"view listed as table: $tables")
    // a view cannot shadow a table name
    intercept[Exception] {
      spark.sql("CREATE VIEW gv.db.t AS SELECT 1 AS x") }
    // alterView round-trips properties through a new version
    vc.alterView(id, ViewChange.setProperty("comment", "hello"))
    assert(vc.loadView(id).properties().get("comment") === "hello")
    vc.alterView(id, ViewChange.removeProperty("comment"))
    assert(!vc.loadView(id).properties().containsKey("comment"))
    // rename keeps the definition
    vc.renameView(id, Identifier.of(Array("db"), "apiview2"))
    assert(!vc.viewExists(id))
    assert(spark.sql("SELECT * FROM gv.db.apiview2").count() === 30)
    spark.sql("DROP VIEW gv.db.apiview2")
  }

  test("creation context is captured: bare names resolve as written") {
    warehouse
    // the body references a bare 2-part name; the captured currentCatalog
    // (the session catalog at creation time) qualifies it, so the view
    // still refuses cleanly rather than mis-resolving — and a fully
    // qualified body works from anywhere
    spark.sql("CREATE VIEW gv.db.ctxview AS SELECT k FROM gv.db.t WHERE k < 3")
    assert(spark.sql("SELECT * FROM gv.db.ctxview").count() === 3)
    // temp views on the session catalog are untouched by the hijack
    spark.sql("CREATE TEMPORARY VIEW plain_temp AS SELECT 42 AS x")
    assert(spark.sql("SELECT x FROM plain_temp").head().getInt(0) === 42)
    spark.sql("DROP VIEW plain_temp")
    spark.sql("DROP VIEW gv.db.ctxview")
  }

  test("captured context reaches subqueries: bare names in IN/EXISTS do not " +
      "resolve against the reader's catalog") {
    warehouse
    val before = spark.catalog.currentCatalog()
    try {
      spark.sql("USE gv.db")
      // bare `t` outside AND bare `dim` INSIDE the subquery expression;
      // qualification must walk into the subquery (transformUp does not)
      spark.sql("CREATE VIEW gv.db.subqview AS SELECT k FROM t " +
        "WHERE k IN (SELECT nk FROM dim WHERE name <> 'zero') AND k < 6")
      spark.sql(s"USE $before")
      // a colliding `dim` in the reader's catalog with DIFFERENT contents:
      // mis-qualification would silently read this one
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW dim AS " +
        "SELECT * FROM VALUES (99L, 'wrong') AS t(nk, name)")
      val ks = spark.sql("SELECT k FROM gv.db.subqview ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      // gv.db.dim yields nk ∈ {1,2}; the reader's colliding dim would
      // yield {99} → an EMPTY result, so (1,2) proves the captured context
      assert(ks === Seq(1L, 2L),
        s"subquery resolved against the reader's catalog: $ks")
    } finally {
      spark.sql(s"USE $before")
      spark.sql("DROP VIEW IF EXISTS dim")
      spark.sql("DROP VIEW IF EXISTS gv.db.subqview")
    }
  }

  test("CTE-bearing view bodies: WITH names are not mis-qualified and " +
      "substitute even though the Substitution batch already ran") {
    warehouse
    val before = spark.catalog.currentCatalog()
    try {
      spark.sql("USE gv.db")
      spark.sql("CREATE VIEW gv.db.cteview AS " +
        "WITH c AS (SELECT k, nk FROM t WHERE k < 5) " +
        "SELECT c.k, d.name FROM c JOIN dim d ON c.nk = d.nk")
      spark.sql(s"USE $before")
      val rows = spark.sql("SELECT k, name FROM gv.db.cteview ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows === Seq((0L, "zero"), (1L, "one"), (2L, "two"),
        (3L, "zero"), (4L, "one")))
      // nested: a view over the CTE view still expands
      spark.sql("CREATE VIEW gv.db.ctewrap AS " +
        "SELECT count(*) AS n FROM gv.db.cteview")
      assert(spark.sql("SELECT n FROM gv.db.ctewrap").head().getLong(0) === 5L)
    } finally {
      spark.sql(s"USE $before")
      spark.sql("DROP VIEW IF EXISTS gv.db.ctewrap")
      spark.sql("DROP VIEW IF EXISTS gv.db.cteview")
    }
  }

  test("crashed mid-CREATE (staged tmp, no committed version) does not " +
      "read as an existing view and CREATE proceeds") {
    warehouse
    val dir = java.nio.file.Paths.get(warehouse, "db", "crashedv", "view")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve(".v1.json.tmp-1234"),
      "{}".getBytes("UTF-8"))
    val id = Identifier.of(Array("db"), "crashedv")
    assert(!vc.viewExists(id),
      "a staged tmp with no committed version read as an existing view")
    intercept[Exception] { vc.loadView(id) }
    spark.sql("CREATE VIEW gv.db.crashedv AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM gv.db.crashedv").head().getInt(0) === 7)
    spark.sql("DROP VIEW gv.db.crashedv")
  }

  test("keyed catalog seals view JSON: the defining SQL is not plaintext") {
    val dir = java.nio.file.Files.createTempDirectory("graft_views_enc").toString
    spark.conf.set("spark.sql.catalog.gve", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gve.warehouse", dir)
    spark.conf.set("spark.sql.catalog.gve.encryption",
      graft.table.EncryptionManagers.serialize(
        new graft.table.AesGcmEncryptionManager(
          "0123456789abcdef0123456789abcdef".getBytes("UTF-8"), "view-key")))
    spark.sql("CREATE TABLE gve.db.s (k BIGINT)")
    spark.sql("INSERT INTO gve.db.s VALUES (1), (2)")
    spark.sql("CREATE VIEW gve.db.sv AS SELECT k FROM gve.db.s WHERE k > 1")
    assert(spark.sql("SELECT * FROM gve.db.sv").count() === 1)
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/db/sv/view/v1.json")),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!raw.contains("SELECT"), "view SQL leaked plaintext on a keyed catalog")
  }
}
