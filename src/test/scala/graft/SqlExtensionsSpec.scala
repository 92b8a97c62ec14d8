package graft

import graft.table.IceTable

import org.apache.spark.sql.functions.col

import org.scalatest.funsuite.AnyFunSuite

/** CALL procedures + partition-field / write-order DDL through the parser
  * extension (ref `TestCallStatementParser.java`,
  * `TestAlterTablePartitionFields.java`, `SparkProcedures.java:44`). */
class SqlExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHelper.spark
  private lazy val warehouse = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    spark.conf.set("spark.sql.catalog.gx", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gx.warehouse", dir)
    dir
  }

  private var n = 0
  private def fresh(): (String, String) = {
    warehouse; n += 1
    val name = s"gx.db.p$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, data STRING, ts TIMESTAMP_NTZ)")
    (name, s"$warehouse/db/p$n")
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD evolves the default spec") {
    val (name, path) = fresh()
    spark.sql(s"ALTER TABLE $name ADD PARTITION FIELD bucket(8, id)")
    var t = IceTable.load(spark, path)
    assert(t.spec.fields.map(f => f.transform.name) === Seq("bucket[8]"))
    spark.sql(s"ALTER TABLE $name ADD PARTITION FIELD days(ts)")
    t = IceTable.load(spark, path)
    assert(t.spec.fields.map(_.transform.name).toSet === Set("bucket[8]", "day"))
    spark.sql(s"ALTER TABLE $name DROP PARTITION FIELD bucket(8, id)")
    t = IceTable.load(spark, path)
    assert(t.spec.fields.map(_.transform.name) === Seq("day"))
    // identity field by bare column name
    spark.sql(s"ALTER TABLE $name ADD PARTITION FIELD data")
    t = IceTable.load(spark, path)
    assert(t.spec.fields.map(_.transform.name).toSet === Set("day", "identity"))
    // REPLACE swaps one field in a single spec commit
    spark.sql(s"ALTER TABLE $name REPLACE PARTITION FIELD days(ts) WITH hours(ts)")
    t = IceTable.load(spark, path)
    assert(t.spec.fields.map(_.transform.name).toSet === Set("hour", "identity"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $name REPLACE PARTITION FIELD days(ts) WITH bucket(4, id)")
    }
  }

  test("SET/DROP IDENTIFIER FIELDS drive default equality-delete keys") {
    val (name, path) = fresh()
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', NULL), (2, 'b', NULL), (3, 'c', NULL)")
    spark.sql(s"ALTER TABLE $name SET IDENTIFIER FIELDS id, data")
    var t = IceTable.load(spark, path)
    assert(t.schema.identifierFieldNames === Seq("id", "data"))
    spark.sql(s"ALTER TABLE $name DROP IDENTIFIER FIELDS data")
    t = IceTable.load(spark, path)
    assert(t.schema.identifierFieldNames === Seq("id"))
    // identifier fields survive the JSON round-trip and feed eq deletes
    import spark.implicits._
    t.addEqualityDeletes(Seq(2L).toDF("id"))
    assert(spark.sql(s"SELECT id FROM $name ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // dropping a non-identifier field errors
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $name DROP IDENTIFIER FIELDS data")
    }
  }

  test("identifier fields are validated and protect their columns") {
    val (name, path) = fresh()
    var t = IceTable.load(spark, path)
    // unknown column
    intercept[Exception] { t.setIdentifierFields(Seq("nope")) }
    // non-primitive / floating identifier types are rejected
    t.updateSchema(_.addColumn("score", org.apache.spark.sql.types.DoubleType))
    intercept[Exception] { t.setIdentifierFields(Seq("score")) }
    // dropping a column that IS an identifier field fails until cleared
    spark.sql(s"ALTER TABLE $name SET IDENTIFIER FIELDS id")
    t = IceTable.load(spark, path)
    val e = intercept[Exception] { t.updateSchema(_.deleteColumn("id")) }
    assert(e.getMessage.contains("identifier field"))
    t.setIdentifierFields(Nil)
    t.updateSchema(_.deleteColumn("id")) // now allowed
    assert(!IceTable.load(spark, path).schema.contains("id"))
  }

  test("ALTER TABLE WRITE ORDERED BY / UNORDERED set the sort order") {
    val (name, path) = fresh()
    spark.sql(s"ALTER TABLE $name WRITE ORDERED BY data DESC NULLS LAST, id")
    var t = IceTable.load(spark, path)
    val so = t.meta.sortOrder
    assert(so.fields.size === 2)
    assert(!so.fields.head.ascending && !so.fields.head.nullsFirst)
    assert(so.fields(1).ascending)
    // ref visitSetWriteDistributionAndOrdering: plain ORDERED BY ⇒ range
    assert(t.meta.property("write.distribution-mode", "hash") === "range")
    spark.sql(s"ALTER TABLE $name WRITE UNORDERED")
    t = IceTable.load(spark, path)
    assert(t.meta.sortOrder.fields.isEmpty)
    assert(t.meta.property("write.distribution-mode", "hash") === "none")
  }

  test("ALTER TABLE WRITE DISTRIBUTED BY PARTITION / LOCALLY ORDERED BY") {
    val (name, path) = fresh()
    // distribution clause ⇒ hash mode; transform sort terms parse
    spark.sql(s"ALTER TABLE $name WRITE DISTRIBUTED BY PARTITION " +
      "LOCALLY ORDERED BY bucket(4, id), data DESC")
    var t = IceTable.load(spark, path)
    assert(t.meta.property("write.distribution-mode", "none") === "hash")
    val so = t.meta.sortOrder
    assert(so.fields.size === 2)
    assert(so.fields.head.transform === "bucket[4]")
    assert(!so.fields(1).ascending)
    // LOCALLY ORDERED BY alone ⇒ none + sort order
    spark.sql(s"ALTER TABLE $name WRITE LOCALLY ORDERED BY id")
    t = IceTable.load(spark, path)
    assert(t.meta.property("write.distribution-mode", "hash") === "none")
    assert(t.meta.sortOrder.fields.size === 1)
    // DISTRIBUTED BY PARTITION alone ⇒ hash + unsorted (ref resets order)
    spark.sql(s"ALTER TABLE $name WRITE DISTRIBUTED BY PARTITION")
    t = IceTable.load(spark, path)
    assert(t.meta.property("write.distribution-mode", "none") === "hash")
    assert(t.meta.sortOrder.fields.isEmpty)
  }

  test("CALL rollback_to_snapshot / set_current_snapshot round-trip") {
    val (name, path) = fresh()
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', NULL)")
    val v1 = IceTable.load(spark, path).currentSnapshot.get.snapshotId
    spark.sql(s"INSERT INTO $name VALUES (2, 'b', NULL)")
    val v2 = IceTable.load(spark, path).currentSnapshot.get.snapshotId
    val out = spark.sql(s"CALL gx.system.rollback_to_snapshot('db.p$n', $v1)").head()
    assert(out.getLong(0) === v2 && out.getLong(1) === v1)
    assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) === 1L)
    spark.sql(s"CALL gx.system.set_current_snapshot(table => 'db.p$n', snapshot_id => $v2)")
    assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) === 2L)
  }

  test("CALL expire_snapshots with TIMESTAMP argument deletes old files") {
    val (name, path) = fresh()
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', NULL)")
    spark.sql(s"INSERT OVERWRITE $name VALUES (2, 'b', NULL)")
    val future = java.time.LocalDateTime.now().plusHours(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val out = spark.sql(
      s"CALL gx.system.expire_snapshots(table => 'db.p$n', older_than => TIMESTAMP '$future')").head()
    assert(out.getLong(0) === 1L) // one expired snapshot
    assert(out.getLong(1) >= 1L) // its files deleted
    assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) === 1L)
    // retain_last protects history even when everything is old enough
    spark.sql(s"INSERT INTO $name VALUES (3, 'c', NULL)")
    val out2 = spark.sql(s"CALL gx.system.expire_snapshots(table => 'db.p$n', " +
      s"older_than => TIMESTAMP '$future', retain_last => 2)").head()
    assert(out2.getLong(0) === 0L) // both remaining snapshots retained
    assert(IceTable.load(spark, path).snapshots.size === 2)
  }

  test("CALL rewrite_data_files compacts; rewrite_manifests returns count") {
    val (name, path) = fresh()
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $name VALUES ($i, 'x', NULL)"))
    val before = IceTable.load(spark, path).newScan().planFiles().size
    val out = spark.sql(s"CALL gx.system.rewrite_data_files('db.p$n')").head()
    assert(out.getLong(0) === before.toLong)
    assert(out.getLong(1) < before.toLong)
    assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) === 4L)
    assert(spark.sql(s"CALL gx.system.rewrite_manifests('db.p$n')").head().getLong(0) === 1L)
  }

  test("CALL remove_orphan_files lists deleted orphans") {
    val (name, path) = fresh()
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', NULL)")
    val t = IceTable.load(spark, path)
    t.io.writeString(s"$path/data/orphan.parquet.tmp.parquet", "junk")
    val rows = spark.sql(
      s"CALL gx.system.remove_orphan_files(table => 'db.p$n', older_than => ${System.currentTimeMillis() + 10000})")
      .collect()
    assert(rows.exists(_.getString(0).contains("orphan")))
    assert(spark.sql(s"SELECT count(*) FROM $name").head().getLong(0) === 1L)
  }

  test("CALL ancestors_of returns the snapshot lineage") {
    val (name, path) = fresh()
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', NULL)")
    spark.sql(s"INSERT INTO $name VALUES (2, 'b', NULL)")
    val ids = spark.sql(s"CALL gx.system.ancestors_of('db.p$n')")
      .collect().map(_.getLong(0)).toSeq
    val t = IceTable.load(spark, path)
    assert(ids.head === t.currentSnapshot.get.snapshotId)
    assert(ids.size === 2)
  }

  test("CALL snapshot imports files in place and disables GC on the new table") {
    warehouse
    val src = java.nio.file.Files.createTempDirectory("graft-snap-src-").toString + "/d"
    spark.range(0, 100).selectExpr("id", "concat('r', id) AS data")
      .write.parquet(src)
    val res = spark.sql(s"CALL gx.system.snapshot('$src', 'db.snap1')").collect()
    assert(res.head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM gx.db.snap1").collect().head.getLong(0) === 100)
    // the snapshot table references the SOURCE files — no data was copied
    val t = IceTable.load(spark, s"$warehouse/db/snap1")
    assert(t.newScan().planFiles().forall(_.file.path.contains("graft-snap-src-")))
    // file-deleting maintenance refuses: the files belong to the source
    val e = intercept[Exception] {
      spark.sql(s"CALL gx.system.expire_snapshots('db.snap1', ${Long.MaxValue})").collect()
    }
    assert(e.getMessage.contains("gc.enabled"))
    intercept[Exception] { t.removeOrphanFiles(System.currentTimeMillis()) }
    intercept[Exception] { t.deleteReachableFiles() }
    // source data is intact and still readable directly
    assert(spark.read.parquet(src).count() === 100)
  }

  test("CALL rebuild_ann_index builds a persisted IVF index over a table") {
    warehouse
    spark.sql("CREATE TABLE gx.db.vecs (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO gx.db.vecs SELECT id, transform(sequence(1, 8), " +
      "x -> cast(sin(id * 31 + x) as float)) FROM range(64)")
    val out = spark.sql("CALL gx.system.rebuild_ann_index(table => 'db.vecs', " +
      "id_col => 'vec_id', vec_col => 'embedding', " +
      s"index_location => '$warehouse/db/vecs_idx', n_lists => 4)").head()
    assert(out.getString(0) === s"$warehouse/db/vecs_idx")
    assert(out.getLong(1) === 4L)
    assert(out.getLong(2) === 64L)
    val idx = graft.llm.IvfIndex.load(spark, s"$warehouse/db/vecs_idx")
    assert(idx.centroids.size === 4)
    // probe-only query returns k neighbors per query id
    assert(idx.topK(Seq(0L), k = 3, nProbe = 4).count() === 3)
  }

  test("CALL refresh_ann_index catches the index up incrementally after appends") {
    warehouse
    spark.sql("CREATE TABLE gx.db.rvecs (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO gx.db.rvecs SELECT id, transform(sequence(1, 8), " +
      "x -> cast(sin(id * 31 + x) as float)) FROM range(64)")
    spark.sql("CALL gx.system.rebuild_ann_index(table => 'db.rvecs', " +
      "id_col => 'vec_id', vec_col => 'embedding', " +
      s"index_location => '$warehouse/db/rvecs_idx', n_lists => 4)")
    // small append → the INCREMENTAL path (no refit)
    spark.sql("INSERT INTO gx.db.rvecs SELECT id + 1000, transform(sequence(1, 8), " +
      "x -> cast(sin(id * 37 + x) as float)) FROM range(3)")
    val r = spark.sql("CALL gx.system.refresh_ann_index(table => 'db.rvecs', " +
      s"index_location => '$warehouse/db/rvecs_idx')").head()
    assert(r.getString(0) === s"$warehouse/db/rvecs_idx")
    assert(r.getLong(1) === 3L && r.getLong(2) === 0L && !r.getBoolean(3), r.toString)
    // the synced vectors are probe-visible: vec 1000 (sin(0*37+x) ==
    // sin(0*31+x) == vec 0's embedding) finds its exact twin at cosine 1
    val idx = graft.llm.IvfIndex.load(spark, s"$warehouse/db/rvecs_idx")
    val twin = idx.topK(Seq(1000L), k = 1, nProbe = 4).head()
    assert(twin.getLong(2) === 0L && math.abs(twin.getDouble(3) - 1.0) < 1e-6,
      twin.toString)
    // big append past refit_share → full re-fit, reported as such
    spark.sql("INSERT INTO gx.db.rvecs SELECT id + 5000, transform(sequence(1, 8), " +
      "x -> cast(sin(id * 41 + x) as float)) FROM range(64)")
    val r2 = spark.sql("CALL gx.system.refresh_ann_index(table => 'db.rvecs', " +
      s"index_location => '$warehouse/db/rvecs_idx', refit_share => 0.2)").head()
    assert(r2.getBoolean(3), r2.toString)
    // DML in range: the changelog path reports deletes, no refit (r12b)
    spark.sql("DELETE FROM gx.db.rvecs WHERE vec_id >= 5060")
    val r3 = spark.sql("CALL gx.system.refresh_ann_index(table => 'db.rvecs', " +
      s"index_location => '$warehouse/db/rvecs_idx', refit_share => 0.5)").head()
    assert(r3.getLong(1) === 0L && r3.getLong(2) === 4L && !r3.getBoolean(3),
      r3.toString)
  }

  test("CALL rebuild/refresh_bm25_index round trip") {
    warehouse
    spark.sql("CREATE TABLE gx.db.corp (doc_id BIGINT, text STRING)")
    spark.sql("INSERT INTO gx.db.corp SELECT id, concat('alpha w', id % 7, " +
      "' beta w', id % 3) FROM range(50)")
    val out = spark.sql("CALL gx.system.rebuild_bm25_index(table => 'db.corp', " +
      "id_col => 'doc_id', text_col => 'text', " +
      s"index_location => '$warehouse/db/corp_idx', n_buckets => 4)").head()
    assert(out.getString(0) === s"$warehouse/db/corp_idx")
    assert(out.getLong(1) === 50L && out.getLong(2) === 200L, out.toString)
    val idx = graft.llm.Bm25Index.load(spark, s"$warehouse/db/corp_idx")
    val q = spark.createDataFrame(Seq((1L, "alpha w1"))).toDF("qid", "qtext")
    assert(idx.query(q, "qid", "qtext", k = 5).count() === 5)
    // append-only range → incremental; DML range → changelog path
    spark.sql("INSERT INTO gx.db.corp SELECT id + 100, 'gamma gamma' FROM range(5)")
    val r1 = spark.sql("CALL gx.system.refresh_bm25_index(table => 'db.corp', " +
      s"index_location => '$warehouse/db/corp_idx')").head()
    assert(r1.getLong(1) === 5L && r1.getLong(2) === 0L && !r1.getBoolean(3),
      r1.toString)
    spark.sql("DELETE FROM gx.db.corp WHERE doc_id >= 103")
    val r2 = spark.sql("CALL gx.system.refresh_bm25_index(table => 'db.corp', " +
      s"index_location => '$warehouse/db/corp_idx')").head()
    assert(r2.getLong(2) === 2L && !r2.getBoolean(3), r2.toString)
    val after = graft.llm.Bm25Index.load(spark, s"$warehouse/db/corp_idx")
    assert(after.docCount === 53L)
    val qg = spark.createDataFrame(Seq((9L, "gamma"))).toDF("qid", "qtext")
    assert(after.query(qg, "qid", "qtext", k = 10).count() === 3)
  }

  test("CALL knn_join writes the batch ANN result to a queryable table") {
    warehouse
    spark.sql("CREATE TABLE gx.db.kvecs (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    spark.sql("INSERT INTO gx.db.kvecs SELECT id, transform(sequence(1, 8), " +
      "x -> cast(sin(id * 31 + x) as float)) FROM range(64)")
    spark.sql("CALL gx.system.rebuild_ann_index(table => 'db.kvecs', " +
      "id_col => 'vec_id', vec_col => 'embedding', " +
      s"index_location => '$warehouse/db/kvecs_idx', n_lists => 4)")
    // corpus-as-queries through pure SQL: output lands in a graft table
    val out = spark.sql("CALL gx.system.knn_join(table => 'db.kvecs', " +
      s"index_location => '$warehouse/db/kvecs_idx', id_col => 'vec_id', " +
      "vec_col => 'embedding', k => 3, n_probe => 4, " +
      s"output_location => '$warehouse/db/kvecs_knn')").head()
    assert(out.getString(0) === s"$warehouse/db/kvecs_knn")
    assert(out.getLong(1) === 64L * 3)
    val res = IceTable.load(spark, s"$warehouse/db/kvecs_knn").toDF
    assert(res.count() === 64L * 3)
    // every vector's top-1 neighbor is itself at cosine ~1
    val self = res.filter(col("rank") === 1)
    assert(self.count() === 64)
    assert(self.filter(col("query_id") === col("neighbor_id")).count() === 64)
    // a second CALL overwrites in place (rerunnable from SQL alone)
    val out2 = spark.sql("CALL gx.system.knn_join(table => 'db.kvecs', " +
      s"index_location => '$warehouse/db/kvecs_idx', id_col => 'vec_id', " +
      "vec_col => 'embedding', k => 1, n_probe => 4, " +
      s"output_location => '$warehouse/db/kvecs_knn')").head()
    assert(out2.getLong(1) === 64L)
    assert(IceTable.load(spark, s"$warehouse/db/kvecs_knn").toDF.count() === 64L)
  }

  test("CALL bm25_join answers a query table through the persisted index") {
    warehouse
    spark.sql("CREATE TABLE gx.db.bjcorp (doc_id BIGINT, text STRING)")
    spark.sql("INSERT INTO gx.db.bjcorp SELECT id, concat('alpha w', id % 7, " +
      "' beta w', id % 3) FROM range(50)")
    spark.sql("CALL gx.system.rebuild_bm25_index(table => 'db.bjcorp', " +
      "id_col => 'doc_id', text_col => 'text', " +
      s"index_location => '$warehouse/db/bjcorp_idx', n_buckets => 4)")
    // corpus-as-queries through pure SQL: results land in a graft table
    val out = spark.sql("CALL gx.system.bm25_join(table => 'db.bjcorp', " +
      s"index_location => '$warehouse/db/bjcorp_idx', id_col => 'doc_id', " +
      "text_col => 'text', k => 3, " +
      s"output_location => '$warehouse/db/bjcorp_hits')").head()
    assert(out.getString(0) === s"$warehouse/db/bjcorp_hits")
    assert(out.getLong(1) === 50L * 3)
    val res = IceTable.load(spark, s"$warehouse/db/bjcorp_hits").toDF
    // scores are identical to the Scala queryJoin (itself pinned to
    // query()): spot-check rank-1 hits all score at each query's max
    val idx = graft.llm.Bm25Index.load(spark, s"$warehouse/db/bjcorp_idx")
    val qdf = spark.table("gx.db.bjcorp")
      .selectExpr("doc_id AS qid", "text AS qtext")
    val direct = idx.queryJoin(qdf, "qid", "qtext", k = 3)
    assert(res.orderBy("query_id", "rank").collect().toSeq ===
      direct.orderBy("query_id", "rank").collect().toSeq)
  }

  test("CALL span_dedup rewrites the corpus into a queryable table") {
    warehouse
    spark.sql("CREATE TABLE gx.db.sddocs (doc_id BIGINT, text STRING)")
    // doc 0/1 share a long span at different alignments; doc 2 is clean
    spark.sql("INSERT INTO gx.db.sddocs VALUES " +
      "(0, 'the quick brown fox jumps over the lazy dog today'), " +
      "(1, 'yesterday the quick brown fox jumps over the lazy dog'), " +
      "(2, 'entirely unrelated content with no overlap at all')")
    val out = spark.sql("CALL gx.system.span_dedup(table => 'db.sddocs', " +
      "id_col => 'doc_id', text_col => 'text', n => 3, min_docs => 2, " +
      s"output_location => '$warehouse/db/sddocs_dedup')").head()
    assert(out.getString(0) === s"$warehouse/db/sddocs_dedup")
    assert(out.getLong(1) === 3L)
    // output carries (id, n_tokens, removed_tokens, text)
    val res = IceTable.load(spark, s"$warehouse/db/sddocs_dedup").toDF
      .select("doc_id", "text").orderBy("doc_id").collect()
    assert(res.length === 3)
    // the shared span is gone from at least one of the pair, the clean
    // doc is untouched
    val texts = res.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(2L) === "entirely unrelated content with no overlap at all")
    assert(!(texts(0L).contains("quick brown fox") &&
      texts(1L).contains("quick brown fox")),
      s"duplicated span survived in both docs: $texts")
  }

  test("normal SQL still parses through the delegate") {
    warehouse
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
    // a non-graft ALTER TABLE shape must not be swallowed
    intercept[Exception] { spark.sql("ALTER TABLE nonexistent_t SET TBLPROPERTIES ('a'='b')") }
  }
}
