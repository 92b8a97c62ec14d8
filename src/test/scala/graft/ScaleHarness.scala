package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale-measurement harness for the IVF index (test scope — never
  * ships in the library jar). Run with
  * `sbt "Test/runMain graft.ScaleHarness [mult]"` on an idle machine per
  * BASELINE.md's measurement protocol.
  *
  * Inflates the sf0.1 embeddings corpus `mult`× with direction-preserving
  * replicas (scaling a vector leaves cosine — and so list assignment —
  * unchanged, so lists stay balanced like the original), caches it under
  * /tmp, then times `IvfIndex.build` and the float-vs-int8 probe paths.
  * The cache is only trusted when its `_SUCCESS` marker exists (a partial
  * directory from a crashed run is rebuilt), and is re-`repartition`ed
  * after read so every pass measures 32-way parallelism, not one task.
  */
object ScaleHarness {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val d = "/root/testdata/sf0.1"
    val embs = Tables.load(spark, d, "embeddings")
    println("dim=" + embs.selectExpr("size(embedding)").head().getInt(0))
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val cache = s"/tmp/graft-bigembs-$mult"
    if (!new java.io.File(cache, "_SUCCESS").exists) {
      val big = embs.crossJoin(spark.range(mult).toDF("r"))
        .select((col("vec_id") * mult + col("r")).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0) + col("r") * lit(1e-4))).as("embedding"))
      big.repartition(32).write.mode("overwrite").parquet(cache)
    }
    val corpus = spark.read.parquet(cache).repartition(32)
    println("corpus rows=" + corpus.count())
    val loc = java.nio.file.Files.createTempDirectory("graft-scale-").toString + "/idx"
    var idx: llm.IvfIndex = null
    val tb = time {
      idx = llm.IvfIndex.build(spark, corpus, "vec_id", "embedding", loc, nLists = 8)
    }
    println(f"${mult}x build $tb%.1f s")
    val qids = LlmQueries.AnnQueryIds
    (1 to 2).foreach { _ =>
      consume(idx.topK(qids, 5, nProbe = 2))
      consume(idx.topKQuantized(qids, 5, nProbe = 2))
    }
    val tf = (1 to 5).map(_ => time(consume(idx.topK(qids, 5, nProbe = 2))))
    val tq = (1 to 5).map(_ => time(consume(idx.topKQuantized(qids, 5, nProbe = 2))))
    println(f"${mult}x float ${tf.sorted.apply(2)}%.3f ${tf.map(t => f"$t%.3f").mkString(",")}")
    println(f"${mult}x int8  ${tq.sorted.apply(2)}%.3f ${tq.map(t => f"$t%.3f").mkString(",")}")

    // PQ (r12c): build with 8-byte residual codes, probe via ADC ranking —
    // the 32×-less-IO ranking phase vs the float column, 8× vs int8
    val pqLoc = java.nio.file.Files.createTempDirectory("graft-scale-pq-")
      .toString + "/idx"
    var pqIdx: llm.IvfIndex = null
    val tbPq = time {
      pqIdx = llm.IvfIndex.buildPq(spark, corpus, "vec_id", "embedding",
        pqLoc, nLists = 8, m = 8, ks = 256)
    }
    println(f"${mult}x PQ build $tbPq%.1f s (float build above: $tb%.1f s)")
    (1 to 2).foreach(_ => consume(pqIdx.topKPq(qids, 5, nProbe = 2)))
    val tp = (1 to 5).map(_ => time(consume(pqIdx.topKPq(qids, 5, nProbe = 2))))
    println(f"${mult}x pq    ${tp.sorted.apply(2)}%.3f ${tp.map(t => f"$t%.3f").mkString(",")}")
    // distributed batch kNN join: ~1k query rows against the full corpus
    val qdf = corpus.filter(col("vec_id") % lit(math.max(1L, corpus.count() / 1000)) === 0)
    println("knn queries=" + qdf.count())
    (1 to 2).foreach(_ => consume(idx.knnJoin(qdf, "vec_id", "embedding", 5, nProbe = 2)))
    val tj = (1 to 3).map(_ => time(consume(
      idx.knnJoin(qdf, "vec_id", "embedding", 5, nProbe = 2))))
    println(f"${mult}x knnJoin ${tj.sorted.apply(1)}%.3f ${tj.map(t => f"$t%.3f").mkString(",")}")

    // incremental refresh at scale (r12): corpus as a graft table, a 1%
    // appended delta caught up against the frozen centroids — the number
    // that justifies refresh existing (vs the full build measured above)
    val base = java.nio.file.Files.createTempDirectory("graft-scale-r-").toString
    val ct = table.IceTable.create(spark, s"$base/corpus",
      meta.Schema.fresh(corpus.schema))
    ct.append(corpus)
    val rloc = s"$base/idx"
    val tb2 = time {
      llm.IvfIndex.buildFrom(spark, ct, "vec_id", "embedding", rloc, nLists = 8)
    }
    val deltaRows = math.max(1, (corpus.count() / 100).toInt)
    ct.append(corpus.limit(deltaRows)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding")))
    val tr = time {
      val r = llm.IvfIndex.refresh(spark, ct, rloc)
      require(!r.refit && r.appended == deltaRows, r.toString)
    }
    println(f"${mult}x refresh of 1%% delta ($deltaRows rows): $tr%.1f s " +
      f"vs full buildFrom $tb2%.1f s (${tb2 / tr}%.1fx)")

    // changelog DML refresh at scale (r12b): delete ~1% of the corpus,
    // reconcile through the row-level changelog MERGE — the path that
    // previously forced a full refit
    val delBound = 1000000000L + deltaRows - (deltaRows / 2)
    ct.delete(meta.expr.Exprs.greaterThan("vec_id", delBound))
    val td = time {
      val r = llm.IvfIndex.refresh(spark, ct, rloc)
      require(!r.refit && r.deleted > 0, r.toString)
    }
    println(f"${mult}x changelog refresh of ~0.5%% deletes: $td%.1f s " +
      f"vs full buildFrom $tb2%.1f s (${tb2 / td}%.1fx)")
    spark.stop()
  }
}
