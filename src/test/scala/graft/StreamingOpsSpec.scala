package graft

import java.nio.file.Files

import graft.llm.{Dedup, StreamingOps}
import graft.meta.Schema
import graft.table.IceTable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingOpsSpec extends AnyFunSuite {
  import SparkSessionHelper._

  private def memStream() = {
    import spark.implicits._
    org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
  }

  private def docsDF(mem: org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]) =
    mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))

  test("streaming exact dedup drops duplicates within and across batches") {
    val base = Files.createTempDirectory("graft-sops-").toString
    val mem = memStream()
    val q = StreamingOps.dedupExactStream(docsDF(mem), "text")
      .writeStream.format("memory").queryName("sops_dedup")
      .option("checkpointLocation", s"$base/cp").outputMode("append").start()
    try {
      mem.addData((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      q.processAllAvailable()
      mem.addData((4L, "alpha beta"), (5L, "delta"))
      q.processAllAvailable()
      val got = spark.table("sops_dedup").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // one survivor per distinct text, batch-2 replay of "alpha beta"
      // stopped by the state store
      assert(got.map(_._2).sorted.toSeq === Seq("alpha beta", "delta", "gamma"))
      assert(!got.map(_._1).contains(4L))
      // schema passes through unchanged (no fingerprint column leaks)
      assert(spark.table("sops_dedup").columns.toSeq === Seq("doc_id", "text"))
    } finally q.stop()
  }

  test("watermark-bounded dedup drops in-window duplicates, keeps event-time schema") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sops-").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val df = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("ts"),
      col("_3").as("text"))
    val q = StreamingOps
      .dedupExactStreamWithinWatermark(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sops_wm")
      .option("checkpointLocation", s"$base/cp").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    try {
      mem.addData((1L, at(0), "x"), (2L, at(1), "x"), (3L, at(2), "y"))
      q.processAllAvailable()
      // next batch: duplicate 4 minutes after first sighting — in window
      mem.addData((4L, at(4), "y"))
      q.processAllAvailable()
      val texts = spark.table("sops_wm").collect().map(_.getString(2)).sorted
      assert(texts.toSeq === Seq("x", "y"))
      assert(spark.table("sops_wm").columns.toSeq === Seq("doc_id", "ts", "text"))
    } finally q.stop()
  }

  test("near-dup filter vs corpus index: drops verified near-dups, parity with LSH pairs") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "machine learning models require very large clean training corpora to work")
    ).toDF("doc_id", "text")
    val index = StreamingOps.corpusLshIndex(corpus, "doc_id", "text").cache()
    val batch = Seq(
      // one word changed vs corpus 100 — a strong near-dup
      (1L, "the quick brown fox jumps over the lazy dog near the river shore today"),
      (2L, "completely unrelated sentence about cooking pasta with fresh basil leaves"),
      // verbatim copy of corpus 101
      (3L, "machine learning models require very large clean training corpora to work")
    ).toDF("doc_id", "text")
    val kept = StreamingOps
      .nearDupFilterAgainstCorpus(batch, "doc_id", "text", index, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // parity: a batch doc is dropped iff minHashLshPairs (same bands/hashes)
    // pairs it with a corpus doc on the union
    val crossDropped = Dedup.minHashLshPairs(corpus.unionByName(batch),
        "doc_id", "text", threshold = 0.5)
      .filter(col("id_a") < 100L && col("id_b") >= 100L)
      .select("id_a").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L) -- crossDropped)
    // and the planted near-dups really were caught
    assert(crossDropped === Set(1L, 3L))
  }

  test("hygiene ingest end-to-end: dedup, decontaminate, near-dup filter, idempotent append") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sops-").toString
    val dst = IceTable.create(spark, s"$base/t",
      Schema.fresh(Seq((1L, "x")).toDF("doc_id", "text").schema))
    val evalSet = Seq("what is the capital of atlantis under the sea")
      .toDF("text")
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val index = StreamingOps.corpusLshIndex(corpus, "doc_id", "text").cache()
    val mem = memStream()
    val q = StreamingOps.dedupExactStream(docsDF(mem), "text")
      .writeStream
      .foreachBatch(StreamingOps.hygieneSink(dst, "ingest", "doc_id", "text",
        evalSet = Some(evalSet), corpusIndex = Some(index), threshold = 0.5))
      .option("checkpointLocation", s"$base/cp").start()
    try {
      mem.addData(
        (1L, "a perfectly clean document about gardening and small tomatoes"),
        (2L, "a perfectly clean document about gardening and small tomatoes"), // in-batch dup
        (3L, "students asked what is the capital of atlantis yesterday"),       // eval 3-gram overlap
        (4L, "the quick brown fox jumps over the lazy dog near the river shore today")) // corpus near-dup
      q.processAllAvailable()
      mem.addData(
        (5L, "a perfectly clean document about gardening and small tomatoes"),  // cross-batch dup
        (6L, "a second clean document mentioning sailing boats and calm lakes"))
      q.processAllAvailable()
      val got = dst.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // which of the two in-batch twins (1, 2) survives is partition-order
      // dependent — exactly one must; 3 (contaminated), 4 (near-dup) and
      // 5 (cross-batch dup) must not; 6 must
      val ids = got.map(_._1)
      assert((ids & Set(1L, 2L)).size === 1, s"got $got")
      assert((ids -- Set(1L, 2L)) === Set(6L), s"got $got")
      // every committed epoch carries the idempotency marker
      assert(dst.snapshots.forall(_.summary.contains("streaming-epoch-id")))
    } finally q.stop()
  }

  test("indexedIngestSink keeps the BM25 and ANN indexes fresh per epoch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-sidx-").toString
    // corpus carries both a text and an embedding column; both indexes
    // hang off the SAME table so the watermarks line up
    val seed = (0L until 40L).map(i => (i,
      s"seed document w${i % 7} about topic w${i % 3}",
      (0 until 8).map(j => math.sin(i * 31 + j).toFloat)))
    val corpus = IceTable.create(spark, s"$base/corpus",
      Schema.fresh(seed.toDF("doc_id", "text", "embedding").schema))
    corpus.append(seed.toDF("doc_id", "text", "embedding"))
    graft.llm.Bm25Index.buildFrom(spark, corpus, "doc_id", "text",
      s"$base/bm25", nBuckets = 4)
    graft.llm.IvfIndex.buildFrom(spark, corpus, "doc_id", "embedding",
      s"$base/ann", nLists = 4)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Seq[Float])](spark)
    val q = mem.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        col("_3").as("embedding"))
      .writeStream
      .foreachBatch(StreamingOps.indexedIngestSink(corpus, "idxing",
        bm25Location = Some(s"$base/bm25"), annLocation = Some(s"$base/ann")))
      .option("checkpointLocation", s"$base/cp").start()
    try {
      // epoch 1: a novel doc with a distinctive term and vec 0's twin
      mem.addData((1000L, "zanzibar spice markets zanzibar",
        (0 until 8).map(j => math.sin(0L * 31 + j).toFloat)))
      q.processAllAvailable()
      // epoch 2: more docs — each epoch refreshes incrementally
      mem.addData((1001L, "another zanzibar mention", (0 until 8)
        .map(j => math.sin(7L * 31 + j).toFloat)))
      q.processAllAvailable()
      val bm = graft.llm.Bm25Index.load(spark, s"$base/bm25")
      assert(bm.docCount === 42L)
      val hits = bm.query(Seq((1L, "zanzibar")).toDF("qid", "qtext"),
        "qid", "qtext", k = 5).collect()
      assert(hits.map(_.getLong(2)).toSet === Set(1000L, 1001L))
      // the ANN index sees the streamed vector: 1000's exact twin is 0
      val ann = graft.llm.IvfIndex.load(spark, s"$base/ann")
      val twin = ann.topK(Seq(1000L), k = 1, nProbe = 4).head()
      assert(twin.getLong(2) === 0L && math.abs(twin.getDouble(3) - 1.0) < 1e-6)
      // both stayed on the incremental path: still the original version dir
      assert(new java.io.File(s"$base/bm25/ix-v1").isDirectory &&
        !new java.io.File(s"$base/bm25/ix-v2").exists)
      assert(new java.io.File(s"$base/ann/ix-v1").isDirectory &&
        !new java.io.File(s"$base/ann/ix-v2").exists)
      // watermarks caught up to the corpus head — replayed epochs would
      // no-op end to end (appendOnce skips, refresh sees no delta)
      val head = corpus.meta.currentSnapshotId.get.toString
      assert(bm.table.meta.properties(graft.llm.Bm25Index.CorpusSnapProp) === head)
      assert(ann.table.meta.properties(graft.llm.IvfIndex.CorpusSnapProp) === head)
    } finally q.stop()
  }
}
