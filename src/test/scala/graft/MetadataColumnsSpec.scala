package graft

import java.nio.file.Files

import graft.meta.Schema
import graft.table.IceTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `_file` / `_pos` metadata columns (ref `core/.../MetadataColumns.java`):
  * hidden row-lineage columns resolved by the native DSv2 scan. */
class MetadataColumnsSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private def freshCatalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft-metacol-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.spark.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("_file and _pos resolve on parquet; hidden from SELECT *") {
    val wh = freshCatalog("mc1")
    spark.sql("CREATE TABLE mc1.db.t (k INT, v STRING)")
    spark.sql("INSERT INTO mc1.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    spark.sql("INSERT INTO mc1.db.t SELECT id, concat('v', id) FROM range(100, 150)")
    // SELECT * must not include metadata columns
    assert(spark.sql("SELECT * FROM mc1.db.t").columns.toSeq === Seq("k", "v"))
    val rows = spark.sql("SELECT _file, _pos, k FROM mc1.db.t").collect()
    assert(rows.length === 150)
    val t = IceTable.load(spark, s"$wh/db/t")
    val livePaths = t.newScan().planFiles().map(_.file.path).toSet
    assert(rows.map(_.getString(0)).toSet === livePaths)
    // per file: positions are 0..n-1, each exactly once
    rows.groupBy(_.getString(0)).foreach { case (f, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (0L until rs.length).toSeq, f)
    }
    // k can be joined back through (_file, _pos) uniqueness
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length === 150)
  }

  test("_pos reports original file ordinals under pushed filters") {
    val wh = freshCatalog("mc2")
    spark.sql("CREATE TABLE mc2.db.t (k INT)")
    // one task → one file, insertion order preserved
    import spark.implicits._
    (0 until 100).toDF("k").coalesce(1).writeTo("mc2.db.t").append()
    val rows = spark.sql("SELECT k, _pos FROM mc2.db.t WHERE k >= 50").collect()
    assert(rows.length === 50)
    // row k was written at ordinal k: a pushed filter must not renumber
    rows.foreach(r => assert(r.getLong(1) === r.getInt(0).toLong))
  }

  test("_pos survives merge-on-read position deletes (original ordinals, gaps)") {
    val wh = freshCatalog("mc3")
    spark.sql("CREATE TABLE mc3.db.t (k INT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    import spark.implicits._
    (0 until 10).toDF("k").coalesce(1).writeTo("mc3.db.t").append()
    spark.sql("DELETE FROM mc3.db.t WHERE k IN (2, 5)")
    val rows = spark.sql("SELECT k, _pos FROM mc3.db.t").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 3, 4, 6, 7, 8, 9))
    // deleted ordinals are GAPS; survivors keep their original positions
    rows.foreach { case (k, pos) => assert(pos === k.toLong) }
  }

  test("_file/_pos on ORC and Avro via synthesized whole-file ordinals") {
    for ((fmt, cat) <- Seq(("orc", "mc4"), ("avro", "mc5"))) {
      freshCatalog(cat)
      spark.sql(s"CREATE TABLE $cat.db.t (k INT) " +
        s"TBLPROPERTIES ('write.format.default' = '$fmt')")
      import spark.implicits._
      (0 until 20).toDF("k").coalesce(1).writeTo(s"$cat.db.t").append()
      val rows = spark.sql(s"SELECT k, _pos, _file FROM $cat.db.t").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      assert(rows.length === 20)
      assert(rows.map(_._3).distinct.length === 1)
      assert(rows.map(_._3).head.contains("." + fmt) ||
        rows.map(_._3).head.endsWith(fmt))
      rows.foreach { case (k, pos, _) => assert(pos === k.toLong, s"$fmt k=$k") }
      // a filter still yields true file ordinals (reader filters are
      // dropped for synthesized positions)
      val f = spark.sql(s"SELECT k, _pos FROM $cat.db.t WHERE k >= 10").collect()
      assert(f.length === 10)
      f.foreach(r => assert(r.getLong(1) === r.getInt(0).toLong))
    }
  }

  test("_file matches the files metadata table; partitioned tables work") {
    freshCatalog("mc6")
    spark.sql("CREATE TABLE mc6.db.t (k INT, part STRING) PARTITIONED BY (part)")
    spark.sql("INSERT INTO mc6.db.t VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    val metaFiles = spark.sql("SELECT file_path FROM mc6.db.t.files")
      .collect().map(_.getString(0)).toSet
    val scanned = spark.sql("SELECT DISTINCT _file FROM mc6.db.t")
      .collect().map(_.getString(0)).toSet
    assert(scanned === metaFiles)
    // partition-pruned read keeps correct lineage
    val a = spark.sql("SELECT k, _file, _pos FROM mc6.db.t WHERE part = 'a'")
      .collect()
    assert(a.length === 2)
    assert(a.map(_.getLong(2)).sorted.toSeq === Seq(0L, 1L))
  }

  test("_pos stays file-absolute across byte-range slices of one file") {
    val wh = freshCatalog("mc8")
    spark.sql("CREATE TABLE mc8.db.t (k BIGINT, pad STRING)")
    import spark.implicits._
    (0L until 20000L).map(i => (i, "x" * 100)).toDF("k", "pad")
      .coalesce(1).writeTo("mc8.db.t").append()
    val t = IceTable.load(spark, s"$wh/db/t")
    val size = t.newScan().planFiles().head.file.fileSizeBytes
    val df = spark.read.format("graft").option("split-size", (size / 4).toString)
      .load(s"$wh/db/t").select("k", "_pos")
    assert(df.rdd.getNumPartitions >= 3, "file should fan out into slices")
    // rows were written in k order into one file: ordinal k at position k,
    // regardless of which byte-range slice served it
    assert(df.where(col("k") =!= col("_pos")).count() === 0)
    assert(df.count() === 20000)
  }

  test("_deleted flags tombstoned rows instead of hiding them") {
    val wh = freshCatalog("mc9")
    spark.sql("CREATE TABLE mc9.db.t (k INT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    import spark.implicits._
    (0 until 10).toDF("k").coalesce(1).writeTo("mc9.db.t").append()
    spark.sql("DELETE FROM mc9.db.t WHERE k IN (2, 5)")
    // the plain read hides deleted rows…
    assert(spark.sql("SELECT count(*) FROM mc9.db.t").head().getLong(0) === 8L)
    // …the _deleted read surfaces all 10, flagged, with true ordinals
    val rows = spark.sql("SELECT k, _deleted, _pos FROM mc9.db.t").collect()
      .map(r => (r.getInt(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length === 10)
    assert(rows.filter(_._2).map(_._1).toSeq === Seq(2, 5))
    rows.foreach { case (k, _, pos) => assert(pos === k.toLong) }
    // filtering on the flag recovers the live view
    assert(spark.sql("SELECT k FROM mc9.db.t WHERE NOT _deleted").count() === 8L)
    assert(spark.sql("SELECT k FROM mc9.db.t WHERE _deleted").count() === 2L)
  }

  test("_deleted with equality deletes and on ORC (synthesized ordinals)") {
    val wh = freshCatalog("mc10")
    spark.sql("CREATE TABLE mc10.db.t (id INT, v STRING) " +
      "TBLPROPERTIES ('write.format.default' = 'orc')")
    import spark.implicits._
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v").coalesce(1)
      .writeTo("mc10.db.t").append()
    val t = IceTable.load(spark, s"$wh/db/t")
    graft.table.MergeOnRead.addEqualityDeletes(t, Seq(2).toDF("id"), Seq("id"))
    val rows = spark.sql("SELECT id, _deleted FROM mc10.db.t").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).sortBy(_._1)
    assert(rows.toSeq === Seq((1, false), (2, true), (3, false)))
    // a table with no deletes reports all-false
    spark.sql("CREATE TABLE mc10.db.clean (k INT)")
    spark.sql("INSERT INTO mc10.db.clean VALUES (1), (2)")
    val clean = spark.sql("SELECT _deleted FROM mc10.db.clean").collect()
    assert(clean.length === 2 && clean.forall(!_.getBoolean(0)))
  }

  test("metadata columns via the DataFrame path and with equality deletes") {
    val wh = freshCatalog("mc7")
    spark.sql("CREATE TABLE mc7.db.t (id INT, v STRING)")
    spark.sql("INSERT INTO mc7.db.t VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    val t = IceTable.load(spark, s"$wh/db/t")
    import spark.implicits._
    // equality delete on id=2 (merge-on-read) — eq probing + _pos together
    graft.table.MergeOnRead.addEqualityDeletes(t, Seq(2).toDF("id"), Seq("id"))
    val df = spark.read.format("graft").load(s"$wh/db/t")
      .select(col("_pos"), col("id"), col("_file"))
    assert(df.columns.toSeq === Seq("_pos", "id", "_file"))
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    assert(rows.map(_._2).toSeq === Seq(1, 3))
  }
}
