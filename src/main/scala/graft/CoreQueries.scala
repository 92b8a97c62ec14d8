package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.12 declared query corpus (Q1–Q20), implemented as idiomatic
  * DataFrame programs. Each query has an identical-semantics ANSI SQL oracle
  * (run by the driver in DuckDB over the same parquet) in [[CoreQueries.oracle]].
  * Column aliases match the oracle exactly — the driver's compare sorts columns
  * by name before hashing.
  */
object CoreQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 scan + project (full scan correctness)
    "q1_scan_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q2 predicate algebra: AND/OR/NOT, IN, IS NULL, comparison
    "q2_predicates" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(
          (col("o_orderstatus").isin("F", "O") && !(col("o_totalprice") < 1000.0))
            || col("o_orderpriority").isNull)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    }),

    // Q3 literal conversion: timestamp literals vs timestamp column
    "q3_literals" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1995-01-01 00:00:00'")
          && col("l_shipdate") < expr("TIMESTAMP '1996-01-01 00:00:00'"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q4 metrics-pruned scan: result must equal unpruned filter
    "q4_metrics_prune" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_partkey") === 42)
        .agg(count(lit(1)).as("n"), min("l_quantity").as("mn"), max("l_quantity").as("mx"))
    }),

    // Q5 partition-projection semantics (identity partition on event_type)
    "q5_identity_partition" -> ((s, d) => {
      t(s, d, "events")
        .filter(col("event_type") === "click")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Q6 column pruning
    "q6_column_prune" -> ((s, d) => {
      t(s, d, "customer").select("c_custkey", "c_mktsegment").orderBy("c_custkey")
    }),

    // Q7 bucket-routing volume proxy (byte-exact murmur3 bucket is a state test)
    "q7_bucket_routing" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy((col("l_orderkey") % 8).as("g"))
        .agg(count(lit(1)).as("n"))
        .orderBy("g")
    }),

    // Q8 truncate transform (floored, negative-safe) via graft's transform expr
    "q8_truncate" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(functions.ice_truncate(10, col("l_partkey")).as("p_trunc"))
        .agg(count(lit(1)).as("n"))
        .orderBy("p_trunc")
    }),

    // Q9 temporal transforms: year/month ordinals since epoch via graft exprs
    "q9_time_transforms" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(
          functions.ice_years(col("l_shipdate")).cast("bigint").as("year_ord"),
          (functions.ice_months(col("l_shipdate")) % 12).cast("bigint").as("month_in_year"))
        .agg(count(lit(1)).as("n"))
        .orderBy("year_ord", "month_in_year")
    }),

    // Q10 MERGE equivalence via full-outer-join projection
    "q10_merge_shape" -> ((s, d) => {
      val o = t(s, d, "orders")
      val e = t(s, d, "events")
        .groupBy("user_id").agg(max("value").as("value"))
      o.join(e, o("o_custkey") === e("user_id"), "full_outer")
        .filter(col("o_orderkey").isNotNull)
        .select(col("o_orderkey"),
          round(coalesce(col("value"), col("o_totalprice")), 2).as("new_total"))
        .orderBy("o_orderkey")
    }),

    // Q11 anti join (equality-delete / orphan-file semantics)
    "q11_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    }),

    // Q12 per-file metrics aggregation shape
    "q12_metrics_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("value_count"),
          sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_count"),
          round(min("l_extendedprice"), 2).as("lower_b"),
          round(max("l_extendedprice"), 2).as("upper_b"))
        .orderBy("l_returnflag")
    }),

    // Q13 ScanSummary-style top-k partitions
    "q13_topk_partitions" -> ((s, d) => {
      t(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("event_type"))
        .limit(3)
    }),

    // Q14 PARTITIONS metadata-table aggregation shape
    "q14_partitions_table" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus").as("partition_key"))
        .agg(count(lit(1)).as("record_count"),
          countDistinct("o_orderpriority").as("distinct_pri"))
        .orderBy("partition_key")
    }),

    // Q15 MERGE cardinality-check predicate
    "q15_cardinality_check" -> ((s, d) => {
      t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .select("n_regionkey")
        .orderBy("n_regionkey")
    }),

    // Q16 sort-order write layout (observable as sorted read-back)
    "q16_sort_order" -> ((s, d) => {
      t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .orderBy("s_nationkey", "s_suppkey")
    }),

    // Q17 EXCEPT (expire-snapshots file-diff shape)
    "q17_except" -> ((s, d) => {
      t(s, d, "customer").select("c_nationkey")
        .except(t(s, d, "supplier").select(col("s_nationkey").as("c_nationkey")))
        .orderBy("c_nationkey")
    }),

    // Q18 INTERSECT (valid-file DF construction shape)
    "q18_intersect" -> ((s, d) => {
      t(s, d, "nation").select("n_nationkey")
        .intersect(t(s, d, "customer").select(col("c_nationkey").as("n_nationkey")))
        .orderBy("n_nationkey")
    }),

    // Q19 scalar mix: string/date/math dialect parity pin
    "q19_scalar_mix" -> ((s, d) => {
      t(s, d, "part")
        .orderBy("p_partkey")
        .select(
          upper(substring(col("p_name"), 1, 3)).as("pfx"),
          length(col("p_brand")).as("blen"),
          abs(col("p_size") - 25).as("sz"),
          round(col("p_retailprice") * 0.9, 2).as("disc"))
    }),

    // Q20 multi-way join + agg (TPC-H-ish pricing summary); nation broadcast.
    // r13 optimization round: measured the alternative (explicit broadcast
    // hints streaming lineitem with customer⋈orders as the build side) at
    // 5.18 s vs 5.34 s on identical machine conditions — noise-level — and
    // the hint is scale-hostile (a forced broadcast of customer⋈orders at
    // 100 TB OOMs where the planner's own estimate-driven choice degrades
    // to SMJ), so the estimate-driven plan is kept deliberately.
    "q20_join_agg" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      val n = t(s, d, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))), 2).cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    }),

    // Q21 insert-only MERGE end-to-end through the engine: stage customer
    // keys as a graft table, MERGE aggregated events with only a
    // whenNotMatchedInsertAll clause (LEFT ANTI semantics — must NOT
    // duplicate existing keys), read the table back.
    "q21_merge_insert_only" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q21").toString
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"),
          round(col("c_acctbal"), 2).cast("double").as("v"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/t",
        graft.meta.Schema.fresh(target0.schema))
      tbl.append(target0)
      val src = t(s, d, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id").as("k"))
        .agg(round(sum("value"), 2).cast("double").as("v"))
      tbl.merge(src, Seq("k")).whenNotMatchedInsertAll().execute()
      tbl.toDF.select("k", "v").orderBy("k")
    }),

    // Q22 full MERGE through spark.sql (catalog + session extensions):
    // conditional delete, update, insert — the SQL surface of the same CoW
    // machinery q10/q21 exercise via the Scala API.
    "q22_sql_merge" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q22").toString
      s.conf.set("spark.sql.catalog.gq22", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq22.warehouse", tmp)
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"),
          round(col("c_acctbal"), 2).cast("double").as("v"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema))
      tbl.append(target0)
      t(s, d, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id").as("k"))
        .agg(round(sum("value"), 2).cast("double").as("v"))
        .createOrReplaceTempView("q22_src")
      s.sql("MERGE INTO gq22.db.t AS tg USING q22_src AS sr ON tg.k = sr.k " +
        "WHEN MATCHED AND sr.v < 0 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET v = sr.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (sr.k, sr.v)")
      s.sql("SELECT k, v FROM gq22.db.t ORDER BY k")
    }),

    // Q23 SQL UPDATE with arithmetic assignment through the extensions rule
    "q23_sql_update" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q23").toString
      s.conf.set("spark.sql.catalog.gq23", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq23.warehouse", tmp)
      val target0 = t(s, d, "part")
        .select(col("p_partkey").as("k"), col("p_size").as("sz"),
          round(col("p_retailprice"), 2).cast("double").as("price"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema))
      tbl.append(target0)
      s.sql("UPDATE gq23.db.t SET price = round(price * 1.1, 2) WHERE sz >= 25")
      s.sql("SELECT k, sz, price FROM gq23.db.t ORDER BY k")
    }),

    // Q24 SQL DELETE with a LIKE condition — the non-convertible path: the
    // predicate ADT can't express LIKE, so pruning weakens and rows are
    // re-filtered exactly during the CoW rewrite
    "q24_sql_delete" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q24").toString
      s.conf.set("spark.sql.catalog.gq24", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq24.warehouse", tmp)
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema))
      tbl.append(target0)
      s.sql("DELETE FROM gq24.db.t WHERE k > 100 AND seg LIKE '%MOBILE%'")
      s.sql("SELECT k, seg FROM gq24.db.t ORDER BY k")
    }),

    // Q25 SQL MERGE with NOT MATCHED BY SOURCE: target rows missing from the
    // source are deleted (small keys) or flagged — the Spark-4 clause shape
    // the reference era lacked
    "q25_merge_by_source" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q25").toString
      s.conf.set("spark.sql.catalog.gq25", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq25.warehouse", tmp)
      val target0 = t(s, d, "nation")
        .select(col("n_nationkey").as("k"), col("n_name").as("name"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema))
      tbl.append(target0)
      t(s, d, "supplier").select(col("s_nationkey").as("k")).distinct()
        .createOrReplaceTempView("q25_src")
      s.sql("MERGE INTO gq25.db.t AS tg USING q25_src AS sr ON tg.k = sr.k " +
        "WHEN MATCHED THEN UPDATE SET name = concat(tg.name, '_ok') " +
        "WHEN NOT MATCHED BY SOURCE AND tg.k < 5 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'no_supplier'")
      s.sql("SELECT k, name FROM gq25.db.t ORDER BY k")
    }),

    // Q26 Avro data-format round trip: write orders into an avro-format graft
    // table (the custom FileFormat — no spark-avro in this runtime), read it
    // back and aggregate. Date and double values must survive byte-exact.
    "q26_avro_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q26").toString
      val src = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate"), round(col("o_totalprice"), 2).cast("double").as("price"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/t",
        graft.meta.Schema.fresh(src.schema),
        properties = Map(graft.meta.model.TableProperties.DefaultFileFormat -> "avro"))
      tbl.append(src)
      tbl.toDF.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("price"), 2).cast("double").as("total"),
          min("o_orderdate").as("mind"), max("o_orderdate").as("maxd"))
        .orderBy("o_orderstatus")
    }),

    // Q27 SQL CTAS through the staging catalog (atomic create-as-select),
    // read back via SQL
    "q27_sql_ctas" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q27").toString
      s.conf.set("spark.sql.catalog.gq27", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq27.warehouse", tmp)
      t(s, d, "supplier").createOrReplaceTempView("q27_sup")
      s.sql("CREATE TABLE gq27.db.ct AS SELECT s_nationkey AS k, count(*) AS n, " +
        "round(sum(s_acctbal), 2) AS bal FROM q27_sup GROUP BY s_nationkey")
      s.sql("SELECT k, n, bal FROM gq27.db.ct ORDER BY k")
    }),

    // Q28 metadata-only aggregate pushdown: unfiltered COUNT/MIN/MAX over a
    // catalog table answer from manifest metrics (LocalScan — no data files
    // opened; BatchScanSpec pins the plan shape, this pins the values)
    "q28_agg_pushdown" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q28").toString
      s.conf.set("spark.sql.catalog.gq28", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq28.warehouse", tmp)
      t(s, d, "orders").createOrReplaceTempView("q28_src")
      s.sql("CREATE TABLE gq28.db.ord AS SELECT o_orderkey, o_custkey, o_orderpriority FROM q28_src")
      s.sql("SELECT count(*) AS n, count(o_orderpriority) AS np, " +
        "min(o_orderkey) AS mn, max(o_orderkey) AS mx, " +
        "min(o_custkey) AS mnc, max(o_custkey) AS mxc FROM gq28.db.ord")
    }),

    // Q29 runtime file pruning (DSv2 dynamic partition pruning): star join
    // of an identity-partitioned fact against a selective dim filter; the
    // runtime IN-filter re-plans the fact scan to the matching partitions
    "q29_runtime_prune" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q29").toString
      s.conf.set("spark.sql.catalog.gq29", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq29.warehouse", tmp)
      t(s, d, "supplier").createOrReplaceTempView("q29_sup")
      t(s, d, "nation").createOrReplaceTempView("q29_nat")
      s.sql("CREATE TABLE gq29.db.sup PARTITIONED BY (s_nationkey) AS " +
        "SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS bal FROM q29_sup")
      s.sql("CREATE TABLE gq29.db.nat AS SELECT n_nationkey, n_name FROM q29_nat")
      s.sql("SELECT n.n_name AS nname, count(*) AS n, round(sum(f.bal), 2) AS bal " +
        "FROM gq29.db.sup f JOIN gq29.db.nat n ON f.s_nationkey = n.n_nationkey " +
        "WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_12') " +
        "GROUP BY n.n_name ORDER BY nname")
    }),

    // Q30 merge-on-read SQL DML: DELETE writes position-delete files and
    // UPDATE appends updated copies (write.delete/update.mode=merge-on-read)
    // — the read merges them; result must equal the plain relational oracle
    "q30_mor_dml" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q30").toString
      s.conf.set("spark.sql.catalog.gq30", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq30.warehouse", tmp)
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          round(col("c_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema),
        properties = Map("write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
      tbl.append(target0)
      s.sql("DELETE FROM gq30.db.t WHERE seg LIKE '%MOBILE%'")
      s.sql("UPDATE gq30.db.t SET bal = round(bal + 10.0, 2) WHERE k % 3 = 0")
      s.sql("SELECT k, seg, bal FROM gq30.db.t ORDER BY k")
    }),

    // Q31 delete-file maintenance: several merge-on-read DELETEs accumulate
    // position-delete files; rewritePositionDeleteFiles compacts them to
    // one per partition, bin-pack compaction re-sequences the data, and
    // removeDanglingDeletes drops the now-dead delete files — the visible
    // rows never change through any of it
    "q31_delete_maintenance" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q31").toString
      s.conf.set("spark.sql.catalog.gq31", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq31.warehouse", tmp)
      val target0 = t(s, d, "supplier")
        .select(col("s_suppkey").as("k"), col("s_nationkey").as("nk"),
          round(col("s_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema),
        properties = Map("write.delete.mode" -> "merge-on-read"))
      tbl.append(target0)
      s.sql("DELETE FROM gq31.db.t WHERE k % 7 = 1")
      s.sql("DELETE FROM gq31.db.t WHERE k % 11 = 2")
      s.sql("DELETE FROM gq31.db.t WHERE bal < 0 AND k % 2 = 0")
      tbl.rewritePositionDeleteFiles()
      tbl.rewriteDataFiles()
      tbl.removeDanglingDeletes()
      s.sql("SELECT k, nk, bal FROM gq31.db.t ORDER BY k")
    }),

    // Q32 row-level CDC changelog: a scripted merge-on-read DML sequence
    // (append, MoR DELETE, MoR UPDATE) replayed as net row changes — the
    // update surfaces as delete(old)+insert(new) under one ordinal. The
    // oracle reconstructs the same change stream relationally; snapshot ids
    // are run-dependent, so the query projects change type + dense ordinal.
    "q32_changelog" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q32").toString
      s.conf.set("spark.sql.catalog.gq32", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq32.warehouse", tmp)
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          round(col("c_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema),
        properties = Map("write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
      tbl.append(target0)
      s.sql("DELETE FROM gq32.db.t WHERE k % 7 = 1")
      s.sql("UPDATE gq32.db.t SET bal = round(bal + 5.0, 2) WHERE k % 5 = 0")
      tbl.changelog()
        .select(col("k"), col("seg"), col("bal"),
          col(graft.table.Changelog.ChangeTypeCol).as("ctype"),
          col(graft.table.Changelog.OrdinalCol).as("ord"))
        .orderBy("ord", "ctype", "k")
    }),

    // Q33 merge-on-read DML over ORC data files: position deletes carry
    // SYNTHESIZED row ordinals (ORC has no reader row-index column — readers
    // count whole-file rows in order), yet the result must match the same
    // relational oracle as the parquet path
    "q33_orc_mor" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q33").toString
      s.conf.set("spark.sql.catalog.gq33", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq33.warehouse", tmp)
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          round(col("c_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema),
        properties = Map("write.format.default" -> "orc",
          "write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read"))
      tbl.append(target0)
      s.sql("DELETE FROM gq33.db.t WHERE seg LIKE '%MOBILE%'")
      s.sql("UPDATE gq33.db.t SET bal = round(bal + 10.0, 2) WHERE k % 3 = 0")
      s.sql("SELECT k, seg, bal FROM gq33.db.t ORDER BY k")
    }),

    // Q34 snapshot branches: writes to an audit branch stay invisible on
    // main; reading each side and labeling it exercises ref-targeted commits
    // and ref reads in one relationally-checkable result
    "q34_branch" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q34").toString
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/t",
        graft.meta.Schema.fresh(base.schema))
      tbl.append(base.filter(col("k") % 2 === 0))
      tbl.createBranch("audit")
      tbl.appendToBranch("audit", base.filter(col("k") % 2 =!= 0))
      val main = tbl.toDF.withColumn("side", lit("main"))
      val branch = tbl.newScan().useRef("audit").toDF
        .withColumn("side", lit("branch"))
      main.unionByName(branch).orderBy("side", "k")
    }),

    // Q35 ANALYZE (compute_table_stats): the one-pass column profile's EXACT
    // components — row count and per-column null counts — surfaced from the
    // persisted snapshot-pinned stats file (NDV is an HLL++ estimate, so it
    // is gated by StatsSpec tolerance tests instead of a hash oracle)
    "q35_table_stats" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q35").toString
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("k"),
          when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_mktsegment"))
            .as("seg"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/t",
        graft.meta.Schema.fresh(base.schema))
      tbl.append(base)
      val ref = tbl.computeStats()
      val (rowCount, stats) = graft.table.TableStats.read(tbl.io, ref.path)
      val schema = tbl.meta.schema
      import s.implicits._
      stats.map(st => (schema.fieldName(st.fieldId), st.nullCount, rowCount))
        .toDF("colname", "null_count", "row_count")
        .orderBy("colname")
    }),

    // Q36 storage-partitioned join (r11): orders and customer both
    // bucket(16)-partitioned on custkey; with v2 bucketing on (and
    // broadcast/AQE off so the co-located plan is the one exercised) the
    // join runs over matching key groups with NO exchange on either side —
    // BatchScanSpec pins the plan shape, this entry pins the VALUES
    "q36_spj_bucket_join" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q36").toString
      s.conf.set("spark.sql.catalog.gq36", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq36.warehouse", tmp)
      t(s, d, "orders").createOrReplaceTempView("q36_ord")
      t(s, d, "customer").createOrReplaceTempView("q36_cust")
      s.sql("CREATE TABLE gq36.db.ord PARTITIONED BY (bucket(16, o_custkey)) AS " +
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM q36_ord")
      s.sql("CREATE TABLE gq36.db.cust PARTITIONED BY (bucket(16, c_custkey)) AS " +
        "SELECT c_custkey, c_mktsegment FROM q36_cust")
      val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        // materialize UNDER the SPJ confs (the driver consumes lazily)
        val rows = s.sql(
          "SELECT c.c_mktsegment AS seg, count(*) AS n, " +
            "round(sum(o.price), 2) AS total " +
            "FROM gq36.db.ord o JOIN gq36.db.cust c ON o.o_custkey = c.c_custkey " +
            "GROUP BY c.c_mktsegment ORDER BY seg").collect()
        import s.implicits._
        s.createDataset(rows.map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
          .toDF("seg", "n", "total")
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    }),

    // Q38 compatible-count SPJ (r12): orders bucket(8) joins customer
    // bucket(16) on custkey — the graft bucket function is a
    // ReducibleFunction, so the finer side's ordinals reduce into the
    // coarser key space and the join co-locates with no exchange
    // (BatchScanSpec pins the plan; this entry pins the VALUES under the
    // exact confs that engage the reduced-key grouping)
    "q38_spj_mixed_buckets" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q38").toString
      s.conf.set("spark.sql.catalog.gq38", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq38.warehouse", tmp)
      t(s, d, "orders").createOrReplaceTempView("q38_ord")
      t(s, d, "customer").createOrReplaceTempView("q38_cust")
      s.sql("CREATE TABLE gq38.db.ord PARTITIONED BY (bucket(8, o_custkey)) AS " +
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM q38_ord")
      s.sql("CREATE TABLE gq38.db.cust PARTITIONED BY (bucket(16, c_custkey)) AS " +
        "SELECT c_custkey, c_mktsegment FROM q38_cust")
      val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        s.conf.set(
          "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        // materialize UNDER the SPJ confs (the driver consumes lazily)
        val rows = s.sql(
          "SELECT c.c_mktsegment AS seg, count(*) AS n, " +
            "round(sum(o.price), 2) AS total " +
            "FROM gq38.db.ord o JOIN gq38.db.cust c ON o.o_custkey = c.c_custkey " +
            "GROUP BY c.c_mktsegment ORDER BY seg").collect()
        import s.implicits._
        s.createDataset(rows.map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
          .toDF("seg", "n", "total")
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    }),

    // Q39 sessionization (r12): gap-based sessions over the events table —
    // the batch twin of the flatMapGroupsWithState streaming operator
    // (StreamingSpec pins batch/stream parity; this entry pins the VALUES
    // against DuckDB's window arithmetic). Event time is normalized to
    // epoch MICROS — identical truncation whether the TIMESTAMP(NANOS)
    // column surfaces as a long (legacy nanosAsLong) or TIMESTAMP_NTZ
    // (Spark 4 native), and DuckDB's epoch_us matches. Gap = 12 hours
    "q39_sessionize" -> ((s, d) => {
      val e = t(s, d, "events")
      val tsu = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(cast(ts as timestamp))")
      }
      graft.streaming.Sessionize.sessionizeBatch(
          e.select(col("user_id"), tsu.as("tsu"), col("value")),
          "user_id", "tsu", "value", gap = 43200L * 1000000L)
        .orderBy("user_id", "session_start")
    }),

    // Q40 day-partitioned storage join (r12): two tables partitioned by
    // days(ts) joined on the raw timestamp — the co-partitioned
    // time-series shape; under the SPJ confs neither side exchanges
    // (plan pinned in BatchScanSpec; this entry pins the VALUES). The
    // NANOS event time goes through micros on both sides (q39's
    // truncation-alignment note applies).
    "q40_spj_days_join" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q40").toString
      s.conf.set("spark.sql.catalog.gq40", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq40.warehouse", tmp)
      val e = t(s, d, "events")
      val tsu = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(cast(ts as timestamp))")
      }
      e.select(col("user_id"), timestamp_micros(tsu).as("ts"), col("value"))
        .createOrReplaceTempView("q40_ev")
      s.sql("CREATE TABLE gq40.db.ea PARTITIONED BY (days(ts)) AS " +
        "SELECT ts, user_id, round(value, 2) AS v FROM q40_ev")
      s.sql("CREATE TABLE gq40.db.eb PARTITIONED BY (days(ts)) AS " +
        "SELECT ts, user_id FROM q40_ev WHERE user_id % 3 = 0")
      val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        val rows = s.sql(
          "SELECT a.user_id, count(*) AS n, round(sum(a.v), 2) AS total " +
            "FROM gq40.db.ea a JOIN gq40.db.eb b " +
            "ON a.ts = b.ts AND a.user_id = b.user_id " +
            "GROUP BY a.user_id ORDER BY a.user_id").collect()
        import s.implicits._
        s.createDataset(rows.map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
          .toDF("user_id", "n", "total")
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    }),

    // Q37 encrypted round trip (r11): a fully-keyed catalog — data files,
    // delete files, and the METADATA TREE all sealed — must hash-match the
    // plain relational oracle through CTAS + DELETE + SELECT. Encryption
    // in the correctness gate, not just unit tests.
    "q37_encrypted_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q37").toString
      val manager = new graft.table.AesGcmEncryptionManager(
        "q37q37q37q37q37q37q37q37q37q37q3".getBytes("UTF-8"), "q37")
      s.conf.set("spark.sql.catalog.gq37", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq37.warehouse", tmp)
      s.conf.set("spark.sql.catalog.gq37.encryption",
        graft.table.EncryptionManagers.serialize(manager))
      t(s, d, "supplier").createOrReplaceTempView("q37_sup")
      s.sql("CREATE TABLE gq37.db.t AS SELECT s_suppkey AS k, " +
        "s_nationkey AS nk, round(s_acctbal, 2) AS bal FROM q37_sup")
      s.sql("DELETE FROM gq37.db.t WHERE nk < 5")
      s.sql("SELECT k, nk, bal FROM gq37.db.t ORDER BY k")
    }),

    // Q41 as-of join (r12): for each purchase, the user's latest click at
    // or before it — the point-in-time join, composed as union + keyed
    // window (ONE exchange; the naive range-join plan would be
    // BroadcastNestedLoop). Oracle: DuckDB's native ASOF JOIN — an
    // independent implementation, not a replay of ours. Event time
    // normalizes to epoch micros (q39's truncation-alignment note).
    "q41_asof_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val tsu = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(cast(ts as timestamp))")
      }
      val norm = e.select(col("event_id"), col("user_id"),
        col("event_type"), tsu.as("t"), round(col("value"), 2).as("v"))
      val purchases = norm.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "t")
      val clicks = norm.filter(col("event_type") === "click")
        .select(col("user_id"), col("t").as("ct"), col("v").as("click_value"))
      graft.operators.TemporalJoins.asofJoin(
          purchases, clicks, "t", "ct", Seq("user_id"))
        .select("event_id", "ct", "click_value")
        .orderBy("event_id")
    }),

    // Q42 range join (r12): events inside each user's first-30-minute
    // window — interval containment via grid-bucketed equi-join (cells =
    // 10 min), never a nested-loop plan. Oracle: plain BETWEEN join.
    "q42_range_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val tsu = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(cast(ts as timestamp))")
      }
      val norm = e.select(col("event_id"), col("user_id"), tsu.as("t"))
      val windows = norm.groupBy("user_id")
        .agg(min(col("t")).as("ws"), (min(col("t")) + 1800000000L).as("we"))
      graft.operators.TemporalJoins.rangeJoin(
          norm, windows, "t", "ws", "we", keys = Seq("user_id"),
          bucketWidth = 600000000L)
        .select("event_id", "user_id", "ws")
        .orderBy("event_id")
    }),

    // Q43 incremental aggregate view (r12): a materialized per-customer
    // rollup maintained from the source CHANGELOG across a DELETE and an
    // INSERT — the refresh recomputes only changed groups, and the final
    // view must hash-match the oracle's plain re-aggregation of the same
    // end state. End-to-end through the CALL procedures.
    "q43_incremental_mv" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q43").toString
      s.conf.set("spark.sql.catalog.gq43", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq43.warehouse", tmp)
      t(s, d, "orders").createOrReplaceTempView("q43_orders")
      t(s, d, "customer").createOrReplaceTempView("q43_cust")
      s.sql("CREATE TABLE gq43.db.src AS SELECT o_custkey AS k, " +
        "round(o_totalprice, 2) AS v FROM q43_orders")
      s.sql("CALL gq43.system.create_aggregate_view(table => 'db.src', " +
        s"view_location => '$tmp/mv', keys => 'k', " +
        "aggs => 'count(*) AS n; round(sum(v), 2) AS total; " +
        "round(max(v), 2) AS hi')").collect()
      s.sql("DELETE FROM gq43.db.src WHERE k % 7 = 0")
      s.sql("INSERT INTO gq43.db.src SELECT c_custkey AS k, 1.5 AS v " +
        "FROM q43_cust WHERE c_custkey % 10 = 0")
      s.sql(s"CALL gq43.system.refresh_aggregate_view(" +
        s"view_location => '$tmp/mv')").collect()
      graft.table.IceTable.load(s, s"$tmp/mv").toDF
        .select("k", "n", "total", "hi").orderBy("k")
    }),

    // Q44 equality-delete conversion: a streaming-upsert-shaped history
    // (eq delete, re-insert of some deleted keys, second eq delete on a
    // DIFFERENT key set) converted to position deletes — the sequence
    // rule must keep the re-inserted rows alive through the FIRST delete
    // while the SECOND still reaches them; visible rows never change and
    // the oracle replays the history relationally
    "q44_convert_eq_deletes" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q44").toString
      val base = t(s, d, "supplier")
        .select(col("s_suppkey").as("k"), col("s_nationkey").as("nk"),
          round(col("s_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(base.schema))
      tbl.append(base)
      tbl.addEqualityDeletes(base.filter(col("k") % 5 === 1).select("k"),
        Seq("k"))
      tbl.append(base.filter(col("k") % 10 === 1)
        .withColumn("bal", lit(999.99)))
      tbl.addEqualityDeletes(base.filter(col("nk") === 3)
        .select("nk").distinct(), Seq("nk"))
      val (converted, _) = tbl.convertEqualityDeletes()
      require(converted >= 2, s"expected >=2 eq-delete files, got $converted")
      tbl.toDF.select("k", "nk", "bal").orderBy("k", "bal")
    }),

    // Q45 maintenance autopilot through the gate: a messy MoR + eq-delete
    // history, then ONE CALL system.maintain — conversion, delete
    // compaction, bin-pack, dangling drop, manifest rewrite, expiry all
    // run, and the visible rows must still hash-match the relational
    // replay of the history
    "q45_maintain" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q45").toString
      s.conf.set("spark.sql.catalog.gq45", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq45.warehouse", tmp)
      val base = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          round(col("c_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(base.schema),
        properties = Map("write.delete.mode" -> "merge-on-read",
          "history.expire.max-snapshot-age-ms" -> "0"))
      tbl.append(base)
      s.sql("DELETE FROM gq45.db.t WHERE k % 9 = 2")
      tbl.addEqualityDeletes(base.filter(col("nk") === 7)
        .select("nk").distinct(), Seq("nk"))
      s.sql("DELETE FROM gq45.db.t WHERE bal < 0 AND k % 2 = 1")
      val r = s.sql("CALL gq45.system.maintain(table => 'db.t')").head()
      require(r.getLong(0) >= 1, s"autopilot skipped the conversion: $r")
      s.sql("SELECT k, nk, bal FROM gq45.db.t ORDER BY k")
    }),

    // Q46 SQL views on a graft catalog (Spark 4.1 ships only the
    // ViewCatalog SPI; the parser + resolution wiring is ours): a view
    // over a filter, replaced once (the REPLACED definition must win),
    // then an aggregate THROUGH the view
    "q46_view" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q46").toString
      s.conf.set("spark.sql.catalog.gq46", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq46.warehouse", tmp)
      t(s, d, "orders").createOrReplaceTempView("q46_orders")
      s.sql("CREATE TABLE gq46.db.o AS SELECT o_orderkey AS k, " +
        "o_custkey AS ck, o_orderstatus AS st, round(o_totalprice, 2) AS p " +
        "FROM q46_orders")
      s.sql("CREATE VIEW gq46.db.v AS SELECT k, ck, p FROM gq46.db.o " +
        "WHERE st = 'P'")
      s.sql("CREATE OR REPLACE VIEW gq46.db.v AS SELECT k, ck, p " +
        "FROM gq46.db.o WHERE st = 'O' AND p > 1000.0")
      s.sql("SELECT ck, count(*) AS n, round(sum(p), 2) AS total " +
        "FROM gq46.db.v GROUP BY ck ORDER BY ck")
    }),

    // Q47 bitmap deletion vectors (r13): merge-on-read DML under
    // write.delete.vectors.enabled writes roaring-bitmap sidecars instead
    // of (path, pos) parquet; two DELETE commits accumulate blobs against
    // the same files, rewritePositionDeleteFiles merges them, and the
    // visible rows match the plain relational oracle through every step
    "q47_deletion_vectors" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q47").toString
      val target0 = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          round(col("c_acctbal"), 2).as("bal"))
      val tbl = graft.table.IceTable.create(s, s"$tmp/db/t",
        graft.meta.Schema.fresh(target0.schema),
        properties = Map(
          graft.meta.model.TableProperties.DeleteVectors -> "true",
          "write.delete.mode" -> "merge-on-read"))
      tbl.append(target0)
      tbl.deleteMergeOnRead(graft.meta.expr.Exprs.equalTo("nk", 3L))
      tbl.deleteMergeOnRead(graft.meta.expr.Exprs.greaterThan("bal", 9000.0))
      // every live tombstone must be a DV blob, and the merge step keeps
      // the answer: a wrong bitmap here changes row counts, failing the hash
      require(tbl.newScan().planDeletes().map(_._1).forall(
        _.content == graft.meta.model.FileContent.DeletionVectors),
        "q47: expected deletion vectors, found parquet position deletes")
      graft.table.Maintenance.rewritePositionDeleteFiles(tbl)
      tbl.toDF.select("k", "nk", "bal").orderBy("k")
    }),

    // Q48 row lineage (r13): _row_id assigned at commit (one ordered file
    // → ids are the insertion rank), preserved through a CoW UPDATE, a
    // bin-pack compaction, and a DELETE — DuckDB replays the identity as
    // row_number() over the same insert order, which only matches if no
    // rewrite ever renumbered a surviving row
    "q48_row_lineage" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q48").toString
      s.conf.set("spark.sql.catalog.gq48", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq48.warehouse", tmp)
      t(s, d, "customer").createOrReplaceTempView("q48_customer")
      s.sql("CREATE TABLE gq48.db.t (k BIGINT, seg STRING, bal DOUBLE)")
      s.sql("INSERT INTO gq48.db.t SELECT /*+ COALESCE(1) */ " +
        "c_custkey, c_mktsegment, round(c_acctbal, 2) " +
        "FROM q48_customer ORDER BY c_custkey")
      s.sql("UPDATE gq48.db.t SET seg = 'RICH' WHERE bal > 5000.0")
      val tbl = graft.table.IceTable.load(s, s"$tmp/db/t")
      graft.table.Maintenance.rewriteDataFiles(tbl, minInputFiles = 1)
      s.sql("DELETE FROM gq48.db.t WHERE k < 100")
      s.sql("SELECT k, seg, bal, _row_id AS row_id FROM gq48.db.t ORDER BY k")
    }),

    // Q49 changelog with row ids (r13): a CoW UPDATE's changelog pairs the
    // delete(old)/insert(new) rows by the row's STABLE lineage id — DuckDB
    // replays both rows per updated key with row_number() as the id, which
    // only matches if preservation carried identities through the rewrite
    "q49_changelog_row_ids" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q49").toString
      s.conf.set("spark.sql.catalog.gq49", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gq49.warehouse", tmp)
      t(s, d, "supplier").createOrReplaceTempView("q49_supplier")
      s.sql("CREATE TABLE gq49.db.t (k BIGINT, bal DOUBLE)")
      s.sql("INSERT INTO gq49.db.t SELECT /*+ COALESCE(1) */ " +
        "s_suppkey, round(s_acctbal, 2) FROM q49_supplier ORDER BY s_suppkey")
      val tbl = graft.table.IceTable.load(s, s"$tmp/db/t")
      val snap1 = tbl.currentSnapshot.get.snapshotId
      s.sql("UPDATE gq49.db.t SET bal = round(bal + 1.5, 2) WHERE k % 9 = 0")
      graft.table.IceTable.load(s, s"$tmp/db/t")
        .changelog(Some(snap1), None, withRowIds = true)
        .selectExpr("k", "bal", "_change_type AS change", "_row_id AS row_id")
        .orderBy("row_id", "change")
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q2_predicates" ->
      ("SELECT o_orderkey FROM orders " +
        "WHERE (o_orderstatus IN ('F','O') AND NOT (o_totalprice < 1000.0)) OR o_orderpriority IS NULL " +
        "ORDER BY o_orderkey"),
    "q3_literals" ->
      ("SELECT l_orderkey, l_linenumber FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00' " +
        "ORDER BY l_orderkey, l_linenumber"),
    "q4_metrics_prune" ->
      "SELECT count(*) AS n, min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem WHERE l_partkey = 42",
    "q5_identity_partition" ->
      "SELECT event_type, count(*) AS n FROM events WHERE event_type = 'click' GROUP BY event_type ORDER BY event_type",
    "q6_column_prune" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",
    "q7_bucket_routing" ->
      "SELECT l_orderkey % 8 AS g, count(*) AS n FROM lineitem GROUP BY l_orderkey % 8 ORDER BY g",
    "q8_truncate" ->
      ("SELECT l_partkey - ((l_partkey % 10 + 10) % 10) AS p_trunc, count(*) AS n " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "q9_time_transforms" ->
      ("SELECT CAST(extract(year FROM l_shipdate) AS BIGINT) - 1970 AS year_ord, " +
        "CAST(extract(month FROM l_shipdate) AS BIGINT) - 1 AS month_in_year, count(*) AS n " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "q10_merge_shape" ->
      ("SELECT o.o_orderkey, round(coalesce(e.value, o.o_totalprice), 2) AS new_total " +
        "FROM orders o FULL OUTER JOIN (SELECT user_id, max(value) AS value FROM events GROUP BY user_id) e " +
        "ON o.o_custkey = e.user_id WHERE o.o_orderkey IS NOT NULL ORDER BY o.o_orderkey"),
    "q11_anti_join" ->
      ("SELECT c_custkey FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P') " +
        "ORDER BY c_custkey"),
    "q12_metrics_agg" ->
      ("SELECT l_returnflag, count(*) AS value_count, " +
        "CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count, " +
        "round(min(l_extendedprice),2) AS lower_b, round(max(l_extendedprice),2) AS upper_b " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q13_topk_partitions" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3",
    "q14_partitions_table" ->
      ("SELECT o_orderstatus AS partition_key, count(*) AS record_count, count(DISTINCT o_orderpriority) AS distinct_pri " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q15_cardinality_check" ->
      "SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING count(*) > 1 ORDER BY n_regionkey",
    "q16_sort_order" ->
      "SELECT s_suppkey, s_nationkey FROM supplier ORDER BY s_nationkey, s_suppkey",
    "q17_except" ->
      "SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY c_nationkey",
    "q18_intersect" ->
      "SELECT n_nationkey FROM nation INTERSECT SELECT c_nationkey FROM customer ORDER BY n_nationkey",
    "q19_scalar_mix" ->
      ("SELECT upper(substr(p_name, 1, 3)) AS pfx, CAST(length(p_brand) AS INTEGER) AS blen, " +
        "abs(p_size - 25) AS sz, round(p_retailprice * 0.9, 2) AS disc " +
        "FROM part ORDER BY p_partkey"),
    "q20_join_agg" ->
      ("SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q21_merge_insert_only" ->
      ("WITH tgt AS (SELECT c_custkey AS k, CAST(round(c_acctbal, 2) AS DOUBLE) AS v FROM customer), " +
        "src AS (SELECT user_id AS k, CAST(round(sum(value), 2) AS DOUBLE) AS v FROM events " +
        "WHERE user_id IS NOT NULL GROUP BY user_id) " +
        "SELECT k, v FROM tgt " +
        "UNION ALL " +
        "SELECT s.k, s.v FROM src s WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.k = s.k) " +
        "ORDER BY k"),
    "q22_sql_merge" ->
      ("WITH tgt AS (SELECT c_custkey AS k, CAST(round(c_acctbal, 2) AS DOUBLE) AS v FROM customer), " +
        "src AS (SELECT user_id AS k, CAST(round(sum(value), 2) AS DOUBLE) AS v FROM events " +
        "WHERE user_id IS NOT NULL GROUP BY user_id) " +
        "SELECT t.k, CASE WHEN s.k IS NOT NULL THEN s.v ELSE t.v END AS v " +
        "FROM tgt t LEFT JOIN src s ON t.k = s.k " +
        "WHERE NOT (s.k IS NOT NULL AND s.v < 0) " +
        "UNION ALL " +
        "SELECT s.k, s.v FROM src s WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.k = s.k) " +
        "ORDER BY k"),
    "q23_sql_update" ->
      ("SELECT p_partkey AS k, p_size AS sz, " +
        "CASE WHEN p_size >= 25 THEN round(CAST(round(p_retailprice, 2) AS DOUBLE) * 1.1, 2) " +
        "ELSE CAST(round(p_retailprice, 2) AS DOUBLE) END AS price " +
        "FROM part ORDER BY p_partkey"),
    "q24_sql_delete" ->
      ("SELECT c_custkey AS k, c_mktsegment AS seg FROM customer " +
        "WHERE NOT (c_custkey > 100 AND c_mktsegment LIKE '%MOBILE%') " +
        "ORDER BY c_custkey"),
    "q25_merge_by_source" ->
      ("WITH src AS (SELECT DISTINCT s_nationkey AS k FROM supplier) " +
        "SELECT n.n_nationkey AS k, " +
        "CASE WHEN s.k IS NOT NULL THEN concat(n.n_name, '_ok') ELSE 'no_supplier' END AS name " +
        "FROM nation n LEFT JOIN src s ON n.n_nationkey = s.k " +
        "WHERE NOT (s.k IS NULL AND n.n_nationkey < 5) " +
        "ORDER BY k"),
    "q26_avro_roundtrip" ->
      ("SELECT o_orderstatus, count(*) AS n, " +
        "round(sum(CAST(round(o_totalprice, 2) AS DOUBLE)), 2) AS total, " +
        "min(o_orderdate) AS mind, max(o_orderdate) AS maxd " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q27_sql_ctas" ->
      ("SELECT s_nationkey AS k, count(*) AS n, round(sum(s_acctbal), 2) AS bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY k"),
    "q28_agg_pushdown" ->
      ("SELECT count(*) AS n, count(o_orderpriority) AS np, " +
        "min(o_orderkey) AS mn, max(o_orderkey) AS mx, " +
        "min(o_custkey) AS mnc, max(o_custkey) AS mxc FROM orders"),
    "q29_runtime_prune" ->
      ("SELECT n.n_name AS nname, count(*) AS n, round(sum(round(f.s_acctbal, 2)), 2) AS bal " +
        "FROM supplier f JOIN nation n ON f.s_nationkey = n.n_nationkey " +
        "WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_12') " +
        "GROUP BY n.n_name ORDER BY nname"),
    "q30_mor_dml" ->
      ("SELECT c_custkey AS k, c_mktsegment AS seg, " +
        "CASE WHEN c_custkey % 3 = 0 THEN round(round(c_acctbal, 2) + 10.0, 2) " +
        "ELSE round(c_acctbal, 2) END AS bal " +
        "FROM customer WHERE c_mktsegment NOT LIKE '%MOBILE%' " +
        "ORDER BY c_custkey"),
    "q31_delete_maintenance" ->
      ("SELECT s_suppkey AS k, s_nationkey AS nk, round(s_acctbal, 2) AS bal " +
        "FROM supplier " +
        "WHERE NOT (s_suppkey % 7 = 1) AND NOT (s_suppkey % 11 = 2) " +
        "AND NOT (round(s_acctbal, 2) < 0 AND s_suppkey % 2 = 0) " +
        "ORDER BY s_suppkey"),
    "q32_changelog" ->
      ("WITH base AS (SELECT c_custkey AS k, c_mktsegment AS seg, " +
        "round(c_acctbal, 2) AS bal FROM customer) " +
        "SELECT k, seg, bal, 'insert' AS ctype, 0 AS ord FROM base " +
        "UNION ALL SELECT k, seg, bal, 'delete' AS ctype, 1 AS ord " +
        "FROM base WHERE k % 7 = 1 " +
        "UNION ALL SELECT k, seg, bal, 'delete' AS ctype, 2 AS ord " +
        "FROM base WHERE k % 5 = 0 AND NOT (k % 7 = 1) " +
        "UNION ALL SELECT k, seg, round(bal + 5.0, 2) AS bal, 'insert' AS ctype, 2 AS ord " +
        "FROM base WHERE k % 5 = 0 AND NOT (k % 7 = 1) " +
        "ORDER BY ord, ctype, k"),
    "q33_orc_mor" ->
      ("SELECT c_custkey AS k, c_mktsegment AS seg, " +
        "CASE WHEN c_custkey % 3 = 0 THEN round(round(c_acctbal, 2) + 10.0, 2) " +
        "ELSE round(c_acctbal, 2) END AS bal " +
        "FROM customer WHERE c_mktsegment NOT LIKE '%MOBILE%' " +
        "ORDER BY c_custkey"),
    "q34_branch" ->
      ("SELECT c_custkey AS k, c_mktsegment AS seg, 'main' AS side " +
        "FROM customer WHERE c_custkey % 2 = 0 " +
        "UNION ALL SELECT c_custkey AS k, c_mktsegment AS seg, 'branch' AS side " +
        "FROM customer " +
        "ORDER BY side, k"),
    "q35_table_stats" ->
      ("WITH src AS (SELECT c_custkey AS k, " +
        "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_mktsegment END AS seg " +
        "FROM customer) " +
        "SELECT 'k' AS colname, count(*) - count(k) AS null_count, " +
        "count(*) AS row_count FROM src " +
        "UNION ALL SELECT 'seg' AS colname, count(*) - count(seg) AS null_count, " +
        "count(*) AS row_count FROM src " +
        "ORDER BY colname"),
    "q36_spj_bucket_join" ->
      ("SELECT c.c_mktsegment AS seg, count(*) AS n, " +
        "round(sum(round(o.o_totalprice, 2)), 2) AS total " +
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "GROUP BY c.c_mktsegment ORDER BY seg"),
    "q37_encrypted_roundtrip" ->
      ("SELECT s_suppkey AS k, s_nationkey AS nk, round(s_acctbal, 2) AS bal " +
        "FROM supplier WHERE NOT (s_nationkey < 5) ORDER BY k"),
    "q38_spj_mixed_buckets" ->
      ("SELECT c.c_mktsegment AS seg, count(*) AS n, " +
        "round(sum(round(o.o_totalprice, 2)), 2) AS total " +
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "GROUP BY c.c_mktsegment ORDER BY seg"),
    "q40_spj_days_join" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t, round(value, 2) AS v FROM events) " +
        "SELECT a.user_id, count(*) AS n, round(sum(a.v), 2) AS total " +
        "FROM e a JOIN (SELECT user_id, t FROM e WHERE user_id % 3 = 0) b " +
        "ON a.t = b.t AND a.user_id = b.user_id " +
        "GROUP BY a.user_id ORDER BY a.user_id"),
    "q41_asof_join" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t, " +
        "round(value, 2) AS v FROM events), " +
        "p AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, t, v FROM e WHERE event_type = 'click') " +
        "SELECT p.event_id, c.t AS ct, c.v AS click_value " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t " +
        "ORDER BY p.event_id"),
    "q42_range_join" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), " +
        "w AS (SELECT user_id, min(t) AS ws, min(t) + 1800000000 AS we " +
        "FROM e GROUP BY user_id) " +
        "SELECT e.event_id, e.user_id, w.ws FROM e JOIN w " +
        "ON e.user_id = w.user_id AND e.t BETWEEN w.ws AND w.we " +
        "ORDER BY e.event_id"),
    "q43_incremental_mv" ->
      ("WITH s AS (SELECT o_custkey AS k, round(o_totalprice, 2) AS v FROM orders " +
        "WHERE NOT (o_custkey % 7 = 0) " +
        "UNION ALL SELECT c_custkey AS k, 1.5 AS v FROM customer " +
        "WHERE c_custkey % 10 = 0) " +
        "SELECT k, count(*) AS n, round(sum(v), 2) AS total, " +
        "round(max(v), 2) AS hi FROM s GROUP BY k ORDER BY k"),
    "q44_convert_eq_deletes" ->
      ("WITH base AS (SELECT s_suppkey AS k, s_nationkey AS nk, " +
        "round(s_acctbal, 2) AS bal FROM supplier), " +
        "after1 AS (SELECT * FROM base WHERE k % 5 <> 1), " +
        "reins AS (SELECT k, nk, 999.99 AS bal FROM base WHERE k % 10 = 1), " +
        "all2 AS (SELECT * FROM after1 UNION ALL SELECT * FROM reins) " +
        "SELECT k, nk, bal FROM all2 WHERE nk <> 3 ORDER BY k, bal"),
    "q45_maintain" ->
      ("SELECT c_custkey AS k, c_nationkey AS nk, round(c_acctbal, 2) AS bal " +
        "FROM customer WHERE c_custkey % 9 <> 2 AND c_nationkey <> 7 " +
        "AND NOT (round(c_acctbal, 2) < 0 AND c_custkey % 2 = 1) " +
        "ORDER BY k"),
    "q46_view" ->
      ("SELECT o_custkey AS ck, count(*) AS n, " +
        "round(sum(round(o_totalprice, 2)), 2) AS total FROM orders " +
        "WHERE o_orderstatus = 'O' AND round(o_totalprice, 2) > 1000.0 " +
        "GROUP BY ck ORDER BY ck"),
    "q47_deletion_vectors" ->
      ("SELECT c_custkey AS k, c_nationkey AS nk, round(c_acctbal, 2) AS bal " +
        "FROM customer WHERE c_nationkey <> 3 AND round(c_acctbal, 2) <= 9000.0 " +
        "ORDER BY c_custkey"),
    "q49_changelog_row_ids" ->
      ("WITH base AS (SELECT s_suppkey AS k, round(s_acctbal, 2) AS bal, " +
        "row_number() OVER (ORDER BY s_suppkey) - 1 AS row_id FROM supplier), " +
        "u AS (SELECT * FROM base WHERE k % 9 = 0) " +
        "SELECT k, bal, 'delete' AS change, row_id FROM u " +
        "UNION ALL SELECT k, round(bal + 1.5, 2) AS bal, 'insert' AS change, " +
        "row_id FROM u ORDER BY row_id, change"),
    "q48_row_lineage" ->
      ("WITH base AS (SELECT c_custkey AS k, c_mktsegment AS seg0, " +
        "round(c_acctbal, 2) AS bal, " +
        "row_number() OVER (ORDER BY c_custkey) - 1 AS row_id FROM customer) " +
        "SELECT k, CASE WHEN bal > 5000.0 THEN 'RICH' ELSE seg0 END AS seg, " +
        "bal, row_id FROM base WHERE k >= 100 ORDER BY k"),
    "q39_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t, round(value, 2) AS v FROM events), " +
        "m AS (SELECT user_id, t, v, CASE WHEN lag(t) OVER " +
        "(PARTITION BY user_id ORDER BY t) IS NULL OR t - lag(t) OVER " +
        "(PARTITION BY user_id ORDER BY t) > 43200000000 THEN 1 ELSE 0 END AS ns FROM e), " +
        "x AS (SELECT user_id, t, v, sum(ns) OVER (PARTITION BY user_id ORDER BY t " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, CAST(min(t) AS BIGINT) AS session_start, " +
        "CAST(max(t) AS BIGINT) AS session_end, " +
        "CAST(count(*) AS BIGINT) AS n_events, round(sum(v), 2) AS total_value " +
        "FROM x GROUP BY user_id, sid ORDER BY user_id, session_start")
  )
}
