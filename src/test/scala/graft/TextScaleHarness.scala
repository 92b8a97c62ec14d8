package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale-measurement harness for the text/tokenizer operators
  * (test scope — never ships in the library jar). Run with
  * `sbt "Test/runMain graft.TextScaleHarness [mult]"` on an idle machine
  * per BASELINE.md's measurement protocol.
  *
  * Inflates the sf0.1 documents corpus `mult`× with replicas that keep
  * ids distinct and append a per-replica suffix token (so word tables
  * grow a realistic long tail instead of collapsing to the original
  * vocabulary). The cache is only trusted when `_SUCCESS` exists and is
  * re-`repartition`ed after read so every pass measures 32-way
  * parallelism, not one task.
  */
object TextScaleHarness {
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

    val mult = args.headOption.map(_.toInt).getOrElse(100)
    // optional second arg: comma-separated op names to measure (default all)
    val only: Set[String] = args.drop(1).headOption
      .map(_.split(',').toSet).getOrElse(Set.empty)
    def want(name: String): Boolean = only.isEmpty || only.contains(name)
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val cache = s"/tmp/graft-bigdocs-$mult"
    if (!new java.io.File(cache, "_SUCCESS").exists) {
      val big = docs.crossJoin(spark.range(mult).toDF("r"))
        .select((col("doc_id") * mult + col("r")).as("doc_id"),
          concat(col("text"), lit(" replica"), col("r")).as("text"),
          col("source"))
      big.repartition(32).write.mode("overwrite").parquet(cache)
    }
    val corpus = spark.read.parquet(cache).repartition(32)
    println("corpus rows=" + corpus.count())

    if (want("extract")) {
      // raw-web extraction (r13): wrap every doc in a deterministic page
      // (title/style/script/comment + block structure) and strip it back
      // out; the control measures the same scan + concat WITHOUT the
      // scanner so the printed delta is the extraction cost itself
      val htmlCol = concat(
        lit("<html><head><title>T</title><style>p { color: red; }</style>" +
          "<script>if (a<b) { x(\"&amp;\"); }</script></head>" +
          "<!-- hidden --><body><h1>Head &amp; line</h1><p>"),
        col("text"),
        lit("&nbsp;tail &lt;kept&gt;</p><div>  d1  <b>b</b>  d2  </div>" +
          "<ul><li><a href='/x'>nav one</a></li><li><a href='/y'>nav two</a>" +
          "</li></ul></body></html>"))
      (1 to 2).foreach(_ => consume(corpus.select(col("doc_id"), htmlCol.as("h"))))
      val tCtrl = (1 to 3).map(_ => time(consume(
        corpus.select(col("doc_id"), htmlCol.as("h")))))
      println(f"${mult}x extract_control ${tCtrl.min}%.2f s (min of 3)")
      val tExt = (1 to 3).map(_ => time(consume(
        corpus.select(col("doc_id"), llm.TextOps.extractText(htmlCol).as("t")))))
      println(f"${mult}x extract_text ${tExt.min}%.2f s (min of 3)")
      val tLd = (1 to 3).map(_ => time(consume(
        corpus.select(col("doc_id"),
          llm.TextOps.extractText(htmlCol, maxLinkDensity = 0.5).as("t")))))
      println(f"${mult}x extract_text_ld ${tLd.min}%.2f s (min of 3)")
    }

    if (want("bpe")) {
    val tTrain = time {
      val m = llm.Bpe.train(corpus, "text", numMerges = 25)
      m.count()
    }
    println(f"${mult}x bpe_train(25) $tTrain%.1f s")
    // the production-merge-count gate for the driver-local merge phase:
    // one corpus word-frequency job, then 1000 in-memory merges
    val tTrain1k = time {
      val m = llm.Bpe.train(corpus, "text", numMerges = 1000)
      m.count()
    }
    println(f"${mult}x bpe_train(1000) $tTrain1k%.1f s")
    val merges = llm.Bpe.collectMerges(
      llm.Bpe.train(corpus.limit(50000), "text", numMerges = 25))
    (1 to 2).foreach(_ => consume(corpus.select(
      llm.Bpe.tokenCount(col("text"), merges).as("n"))))
    val tEnc = (1 to 3).map(_ => time(consume(corpus.select(col("doc_id"),
      llm.Bpe.tokenCount(col("text"), merges).as("n")))))
    println(f"${mult}x bpe_encode ${tEnc.min}%.2f s (min of 3: " +
      tEnc.map(t => f"$t%.2f").mkString(", ") + ")")
    }

    if (want("budget")) {
    val tBudget = (1 to 3).map(_ => time(consume(
      llm.Sampling.tokenBudgetMix(corpus, "doc_id", "source",
        llm.TextOps.tokenCount(col("text")), budgetTokens = 100000L,
        seed = 5L))))
    println(f"${mult}x token_budget ${tBudget.min}%.2f s (min of 3)")
    }

    if (want("gopher")) {
    val tGopher = (1 to 3).map(_ => time(consume(corpus.select(col("doc_id"),
      llm.TextOps.gopherRules(col("text")).as("g")))))
    println(f"${mult}x gopher_rules ${tGopher.min}%.2f s (min of 3)")
    }

    // target slice ~1% of the corpus (a benchmark-sized "clean" set)
    val target = corpus.filter(col("doc_id") % 100 === 0)
    if (want("dsir")) {
    val tDsir = (1 to 3).map(_ => time(consume(
      llm.Sampling.selectByImportance(corpus, "doc_id", "text",
        target, "text", k = 1000))))
    println(f"${mult}x dsir_select ${tDsir.min}%.2f s (min of 3)")
    }

    if (want("lm")) {
    val tLm = (1 to 3).map(_ => time(consume(
      llm.TextOps.ngramLmScore(corpus, "doc_id", "text", target, "text")
        .select("doc_id", "lm_logprob"))))
    println(f"${mult}x ngram_lm ${tLm.min}%.2f s (min of 3)")
    }

    if (want("bm25")) {
    val q = spark.createDataFrame(Seq(
      (1L, "hash join merge"), (2L, "fast scan filter"),
      (3L, "customer order data"))).toDF("qid", "qtext")
    val tBm = (1 to 3).map(_ => time(consume(
      llm.TextOps.bm25(corpus, "doc_id", "text", q, "qid", "qtext", k = 10))))
    println(f"${mult}x bm25 ${tBm.min}%.2f s (min of 3)")
    }

    // checkpoint-vs-recompute: the two knob-bearing multi-consumer text ops,
    // measured with persistIntermediate OFF and ON so the knob's scaladoc
    // advice carries numbers at this corpus size
    if (want("bm25join")) {
      // batch BM25 join (r13): index the inflated corpus once, then answer
      // a corpus-scale query batch through the distributed join path; the
      // 3-query retrieval batch through the same index calibrates what the
      // driver-collect path costs on the same postings
      val idxLoc = s"/tmp/graft-bm25join-$mult/idx"
      if (!new java.io.File(s"$idxLoc/metadata").exists) {
        val t = time { llm.Bm25Index.build(spark, corpus, "doc_id", "text",
          idxLoc, nBuckets = 32) }
        println(f"${mult}x bm25_index_build $t%.1f s")
      }
      val idx = llm.Bm25Index.load(spark, idxLoc)
      val batch = corpus.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("qid"), col("text").as("qtext"))
      println("query batch rows=" + batch.count())
      val tJoin = (1 to 3).map(_ => time(consume(
        idx.queryJoin(batch, "qid", "qtext", k = 5))))
      println(f"${mult}x bm25_query_join(batch) ${tJoin.min}%.2f s (min of 3)")
      val q3 = spark.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      val tQ3 = (1 to 3).map(_ => time(consume(
        idx.query(q3, "qid", "qtext", k = 5))))
      println(f"${mult}x bm25_query(3) ${tQ3.min}%.2f s (min of 3)")
      val tJ3 = (1 to 3).map(_ => time(consume(
        idx.queryJoin(q3, "qid", "qtext", k = 5))))
      println(f"${mult}x bm25_query_join(3) ${tJ3.min}%.2f s (min of 3)")
    }

    if (want("persist")) for (persist <- Seq(false, true)) {
      val tag = if (persist) "persist=on " else "persist=off"
      val tTfidf = (1 to 2).map(_ => time(consume(
        llm.TextOps.tfidfTopTerms(corpus, "doc_id", "text", 5,
          persistIntermediate = persist))))
      println(f"${mult}x tfidf $tag ${tTfidf.min}%.2f s (min of 2)")
      val tPass = (1 to 2).map(_ => time(consume(
        llm.TextOps.dropRepeatedPassages(corpus, "doc_id", "text", 32,
          maxOccurrences = 3, persistIntermediate = persist))))
      println(f"${mult}x passages $tag ${tPass.min}%.2f s (min of 2)")
    }

    spark.stop()
  }
}
