package graft

import graft.llm.{Dedup, Multimodal, QualityModel, Similarity, TextOps}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators declared as oracle-checked queries
  * over the `documents`/`embeddings` test tables (SURVEY §7 item 10; graded
  * as first-class operators). Oracles are DuckDB SQL with identical
  * semantics; probabilistic ops (minhash/simhash/LSH-ANN) where the oracle
  * can't be expressed get rows-only checks here plus recall assertions in
  * LlmSpec.
  */
object LlmQueries {
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
  private def embs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
  // corpus row count memoized per dataset dir: LSH parameter derivation
  // needs the size, and re-counting an immutable benchmark corpus on every
  // query call is a wasted full pass
  private val embsCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  private def embsCount(s: SparkSession, d: String): Long =
    embsCounts.computeIfAbsent(d, dir => embs(s, dir).count()).longValue()

  val AnnQueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup groups by raw text
    "llm_dedup_exact" -> ((s, d) => {
      Dedup.exactDupGroups(docs(s, d), "doc_id", col("text"))
        .orderBy("keep_id")
    }),

    // brute-force 3-gram jaccard near-dup pairs (exact oracle baseline)
    "llm_dedup_ngram" -> ((s, d) => {
      Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text", n = 3, threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),

    // MinHash+LSH pairs: recall 1 at jaccard≈1 with 8×2 banding on this
    // corpus, so it matches the same exact-pairs oracle
    "llm_dedup_minhash" -> ((s, d) => {
      Dedup.minHashLshPairs(docs(s, d), "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),

    // trained quality classifier (iterative Adagrad training → FP-path
    // specific, not SQL-replayable; rows-only here — the AUC gates,
    // loss-decrease, and save/load parity live in QualityModelSpec). The
    // corpus's metadata labels are independent of its text by design, so
    // the smoke task is text-derived: "does the doc mention 'merge'" —
    // learnable from hashed unigrams, and the scored output proves the
    // full train→score path runs end-to-end at gate time.
    "llm_quality_model" -> ((s, d) => {
      val corpus = docs(s, d)
      val (model, _) = QualityModel.train(
        corpus.withColumn("y",
          array_contains(TextOps.tokens(col("text")), "merge").cast("int")),
        "doc_id", "text", "y", buckets = 1 << 15, iters = 12)
      model.score(corpus, "doc_id", "text")
        .select(col("doc_id"), round(col("quality_prob"), 3).as("quality_prob"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs (hash-family specific — rows-only check;
    // correctness asserted against ngram ground truth in LlmSpec)
    "llm_dedup_simhash" -> ((s, d) => {
      Dedup.simHashPairs(docs(s, d), "doc_id", "text", maxHamming = 6)
        .orderBy("id_a", "id_b")
    }),

    // duplicate-cluster connected components (large-star/small-star) over
    // the exact pair graph: one (doc_id, component) row per corpus doc.
    // The sf0.01 graph has multi-hop chains, so transitivity is exercised.
    "llm_dedup_cc" -> ((s, d) => {
      val corpus = docs(s, d)
      Dedup.componentIds(corpus, "doc_id",
          Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.6))
        .select(col("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    // deterministic global shuffle into 8 training shards: the md5-keyed
    // permutation is bit-reproducible on any engine (order is checked via
    // the sort_key column, which DEFINES the order)
    "llm_shard_shuffle" -> ((s, d) => {
      llm.Sampling.shuffleIntoShards(docs(s, d), "doc_id", numShards = 8, seed = 42L)
        .select(col("doc_id"), col("shard"), col("sort_key"))
        .orderBy("shard", "sort_key")
    }),

    // deterministic train/val/test assignment by integer thresholds on the
    // 32-bit shuffle variate
    "llm_split" -> ((s, d) => {
      llm.Sampling.assignSplit(docs(s, d), "doc_id",
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), seed = 7L)
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    }),

    // leakage-safe split (r12): near-dup clusters (3-gram jaccard ≥ 0.6)
    // stay WHOLE across train/val/test — the split is drawn from the
    // connected-component id, so a near-duplicate of an eval doc can never
    // sit in the training set
    "llm_leakage_split" -> ((s, d) => {
      val corpus = docs(s, d)
      graft.llm.Sampling.leakageSafeSplit(corpus, "doc_id",
          Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.6),
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)), seed = 7L)
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy("doc_id")
    }),

    // cross-source overlap report (r12): per unordered source pair, the
    // near-dup pairs straddling (or within) it — "how much of B is
    // already in A" before paying to ingest B
    "llm_source_overlap" -> ((s, d) => {
      val corpus = docs(s, d)
      Dedup.crossGroupOverlap(corpus, "doc_id", "source",
          Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.6))
        .orderBy("group_a", "group_b")
    }),

    // per-source quality calibration (r12): percent_rank of the quality
    // score WITHIN each source, so one corpus-wide threshold keeps the
    // same fraction of every source
    "llm_quality_calibrate" -> ((s, d) => {
      TextOps.calibrateByGroup(
          docs(s, d).select(col("doc_id"), col("source"),
            TextOps.qualityScore(col("text")).as("quality")),
          col("quality"), "source")
        .orderBy("doc_id")
    }),

    // duplicated-text fraction (r12): share of each doc's overlapping
    // 3-grams that occur in ≥1 other document — the "mostly boilerplate"
    // filter signal; catches offset-shifted duplication the fixed-window
    // passage removal can't see
    "llm_dup_fraction" -> ((s, d) => {
      TextOps.duplicatedTextFraction(docs(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // unicode NFC normalization (r12): the pre-dedup hygiene pass —
    // composed/decomposed spellings byte-differ and leak past every
    // hash-based dedup unless normalized first. The synthetic corpus is
    // ASCII (changed = false throughout) so this entry pins the PLUMBING
    // against DuckDB's nfc_normalize; the non-ASCII semantics (é forms,
    // NFKC ligature folding) are pinned in LlmSpec
    "llm_normalize" -> ((s, d) => {
      val norm = TextOps.normalizeUnicode(col("text"))
      docs(s, d).select(col("doc_id"), norm.as("text"),
          (col("text") =!= norm).as("changed"))
        .orderBy("doc_id")
    }),

    // raw-web text extraction (r13): the ingestion front door — every
    // crawl arrives as markup BEFORE any other operator applies. The doc
    // text (angle brackets and ampersands escaped, so the only markup is
    // the markup we inject) is wrapped in a deterministic HTML page
    // exercising the extraction contract — title/style/script/comment/
    // CDATA dropping, block-tag line breaks, inline-tag removal, named +
    // numeric entity decode, whitespace collapse — and the oracle replays
    // the same contract as a staged DuckDB regexp pipeline
    "llm_extract" -> ((s, d) => {
      val esc = translate(col("text"), "<&", "(+")
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style type=\"text/css\">p { color: red; }</style>" +
          "<script>if (x < 1) { alert(\"&amp;\"); }</script></head>" +
          "<!-- hidden <p> comment --><body><h1>Heading &amp; more</h1><p>"),
        esc,
        lit("&nbsp;tail &lt;kept&gt; &#39;q&#39; &unknown; x</p>" +
          "<div>  spaced   <b>bold</b>   run  </div>" +
          "<![CDATA[ dropped ]]>" +
          "<ul><li>item one</li><li>item two</li></ul></body></html>"))
      docs(s, d).select(col("doc_id"),
          TextOps.extractText(html).as("text"))
        .orderBy("doc_id")
    }),

    // duplicated-SPAN removal (r12): tokens covered by any cross-document
    // overlapping 3-gram are edited OUT and survivors re-join in document
    // order — the ExactSubstr cut where llm_dup_fraction only scores
    "llm_span_dedup" -> ((s, d) => {
      TextOps.removeDuplicatedSpans(docs(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // the SAME op through pure SQL (r13): a graft table of the documents,
    // CALL system.span_dedup writing the rewritten corpus to a result
    // table, SELECT over that table — replays llm_span_dedup's oracle, so
    // the SQL surface is pinned to the Scala path row-for-row
    "llm_span_dedup_sql" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sdsql").toString
      s.conf.set("spark.sql.catalog.gsd", "graft.spark.GraftCatalog")
      s.conf.set("spark.sql.catalog.gsd.warehouse", tmp)
      val t = graft.table.IceTable.create(s, s"$tmp/db/docs",
        graft.meta.Schema.fresh(docs(s, d).schema))
      t.append(docs(s, d))
      s.sql("CALL gsd.system.span_dedup(table => 'db.docs', " +
        "id_col => 'doc_id', text_col => 'text', n => 3, min_docs => 2, " +
        s"output_location => '$tmp/db/docs_dedup')")
      graft.table.IceTable.load(s, s"$tmp/db/docs_dedup").toDF
        .orderBy("doc_id")
    }),

    // embedding-cosine near-dup pairs
    "llm_dedup_embed" -> ((s, d) => {
      Dedup.embeddingCosinePairs(embs(s, d), "vec_id", "embedding", threshold = 0.45)
        .orderBy("id_a", "id_b")
    }),

    // IVF-bucketed embedding near-dup (approximate — rows-only; recall vs
    // the exact cross join gated in LlmSpec): per-list self-joins with
    // top-2 multiprobe assignment instead of the O(n²) cross join
    "llm_dedup_embed_ivf" -> ((s, d) => {
      Dedup.embeddingNearDupPairsBucketed(embs(s, d), "vec_id", "embedding",
          threshold = 0.45, nLists = 8, assignTo = 2)
        .orderBy("id_a", "id_b")
    }),

    // exact ANN baseline: cosine top-5 for 5 query vectors
    "llm_ann_topk" -> ((s, d) => {
      Similarity.bruteForceTopK(embs(s, d), "vec_id", "embedding", AnnQueryIds, k = 5)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (approximate — rows-only; recall vs exact in LlmSpec).
    // The corpus size is memoized per dataset dir, so repeated queries never
    // re-count the corpus just to size the hash family.
    "llm_ann_lsh" -> ((s, d) => {
      Similarity.lshTopK(embs(s, d), "vec_id", "embedding", AnnQueryIds, k = 5,
        corpusSize = embsCount(s, d))
        .orderBy("query_id", "rank")
    }),

    // IVF (inverted-file) ANN through the PERSISTED index with every list
    // probed: exercises the full index lifecycle (fit, list-partitioned
    // index table, centroid persistence, partition-pruned probe) and the
    // full probe is EXACT — so it shares the brute-force SQL oracle;
    // partial-probe recall and append-sync are pinned in LlmSpec
    "llm_ann_ivf" -> ((s, d) => {
      val loc = java.nio.file.Files.createTempDirectory("graft-ivf-")
        .toString + "/idx"
      val idx = graft.llm.IvfIndex.build(s, embs(s, d), "vec_id", "embedding",
        loc, nLists = 8)
      idx.topK(AnnQueryIds, k = 5, nProbe = 8).orderBy("query_id", "rank")
    }),

    // text statistics: token counts (whitespace + BPE-ish), punct ratio
    // corpus vocabulary: token-frequency top-100 (the BPE/unigram-trainer
    // seed counts) — one combine-side-reduced shuffle + bounded top-k
    "llm_vocab_topk" -> ((s, d) => {
      TextOps.vocabTopK(docs(s, d), "text", 100)
    }),

    // per-document TF-IDF keywords, ranked on the rounded score so the
    // order reproduces bit-for-bit in any engine
    "llm_tfidf" -> ((s, d) => {
      TextOps.tfidfTopTerms(docs(s, d), "doc_id", "text", 3)
    }),

    // corpus-wide repeated-passage removal (C4/RefinedWeb boilerplate
    // step): 4-token passages occurring more than once are stripped
    "llm_passage_dedup" -> ((s, d) => {
      TextOps.dropRepeatedPassages(docs(s, d), "doc_id", "text", 4, 1)
        .orderBy("doc_id")
    }),

    "llm_text_stats" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.tokenCountBpe(col("text")).cast("long").as("n_bpe"),
          round(TextOps.punctRatio(col("text")), 4).as("punct_ratio"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic distribution against the labeled lang column
    "llm_langid" -> ((s, d) => {
      docs(s, d).select(col("lang"), TextOps.langId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    // quantile length trim (exact mode — the approx sketch is the 100 TB
    // path, asserted ≈ exact in LlmSpec)
    "llm_length_filter" -> ((s, d) => {
      TextOps.filterByTokenQuantiles(docs(s, d), "text", 0.1, 0.9, exact = true)
        .select("doc_id").orderBy("doc_id")
    }),

    // quality scoring
    "llm_quality" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // PII scrubbing: emails/URLs redacted to tags, with span counts (the
    // corpus is synthetic word salad, so the spans are injected
    // deterministically from doc_id — both engines build the same dirty text)
    "llm_pii_scrub" -> ((s, d) => {
      val dirty = concat(col("text"), lit(" contact: user"),
        col("doc_id").cast("string"), lit("@example.com via https://ex.com/p?id="),
        col("doc_id").cast("string"))
      docs(s, d).select(col("doc_id"),
          TextOps.piiCount(dirty).cast("long").as("n_pii"),
          TextOps.scrubPii(dirty).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // duplicated-3-gram fraction (Gopher-style repetition/boilerplate signal)
    "llm_repetition" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          TextOps.repetitionRatio(col("text"), 3).as("rep3"))
        .orderBy("doc_id")
    }),

    // whitespace-normalized md5 fingerprint
    "llm_fingerprint" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // token-window chunking (64-token windows, 16-token overlap)
    "llm_chunking" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          posexplode(TextOps.chunks(col("text"), 64, 16)).as(Seq("chunk_idx", "c")))
        .select(col("doc_id"), col("chunk_idx"),
          col("c.n_tokens").as("n_tokens"), col("c.chunk").as("chunk"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // eval-set decontamination: corpus docs sharing ANY word 3-gram with
    // the eval slice (doc_id % 50 = 0) are dropped; survivors pass through
    "llm_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      val evalSet = all.filter(col("doc_id") % 50 === 0)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      Dedup.decontaminate(corpus, "doc_id", "text", evalSet, "text", n = 3)
        .select("doc_id").orderBy("doc_id")
    }),

    // one-row corpus card: counts, cardinalities, dup rate, quantiles
    "llm_corpus_report" -> ((s, d) => {
      TextOps.corpusReport(docs(s, d), "text", "lang", "source")
    }),

    // BM25 retrieval: three fixed queries over the corpus, top-10 each
    "llm_bm25" -> ((s, d) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      TextOps.bm25(docs(s, d), "doc_id", "text", q, "qid", "qtext", k = 10)
        .orderBy("query_id", "rank")
    }),

    // persisted BM25 inverted index (r12c): same queries, same scores as
    // the one-shot llm_bm25 (shared DuckDB oracle) — but answered from a
    // term-bucket-pruned postings scan instead of tokenizing the corpus
    "llm_bm25_index" -> ((s, d) => {
      val idx = Bm25IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-bm25-")
            .toString + "/idx"
          graft.llm.Bm25Index.build(s, docs(s, d), "doc_id", "text", loc,
            nBuckets = 8)
        })
      val q = s.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      idx.query(q, "qid", "qtext", k = 10).orderBy("query_id", "rank")
    }),

    // batch BM25 JOIN (r13): the same queries answered through the
    // table-to-table path (no driver term collect, postings⋈terms
    // equi-join, bounded heap) — replays the SAME DuckDB oracle as
    // llm_bm25/llm_bm25_index, so the gate pins all three shapes
    // hash-identical
    "llm_bm25_join" -> ((s, d) => {
      val idx = Bm25IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-bm25-")
            .toString + "/idx"
          graft.llm.Bm25Index.build(s, docs(s, d), "doc_id", "text", loc,
            nBuckets = 8)
        })
      val q = s.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      idx.queryJoin(q, "qid", "qtext", k = 10).orderBy("query_id", "rank")
    }),

    // hybrid retrieval (r12): BM25 lexical top-10 fused with exact cosine
    // vector top-10 by reciprocal rank (k0=60) — the standard two-tower
    // retrieval combiner; doc_id and vec_id share a domain in the test
    // corpus, so query i's "embedding" is document i's vector
    "llm_hybrid_retrieval" -> ((s, d) => {
      val q = s.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      val bm = TextOps.bm25(docs(s, d), "doc_id", "text", q, "qid", "qtext",
        k = 10).select("query_id", "rank", "doc_id")
      val ann = Similarity.bruteForceTopK(embs(s, d), "vec_id", "embedding",
          Seq(1L, 2L, 3L), k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Similarity.rrfFuse(Seq(bm, ann), k = 5)
        .orderBy("query_id", "rank")
    }),

    // hybrid retrieval over the PERSISTED indexes (r12c): the same fusion
    // answered from the BM25 postings table and the IVF index — both
    // exact here (score-parity pin / full probe), so the one-shot
    // llm_hybrid_retrieval oracle carries over unchanged: one oracle,
    // one-shot and indexed implementations
    "llm_hybrid_indexed" -> ((s, d) => {
      val bmIdx = Bm25IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-bm25-")
            .toString + "/idx"
          graft.llm.Bm25Index.build(s, docs(s, d), "doc_id", "text", loc,
            nBuckets = 8)
        })
      val annIdx = Int8IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-ivf8-")
            .toString + "/idx"
          graft.llm.IvfIndex.build(s, embs(s, d), "vec_id", "embedding",
            loc, nLists = 8)
        })
      val q = s.createDataFrame(Seq(
        (1L, "hash join merge"), (2L, "fast scan filter"),
        (3L, "customer order data"))).toDF("qid", "qtext")
      val bm = bmIdx.query(q, "qid", "qtext", k = 10)
        .select("query_id", "rank", "doc_id")
      val ann = annIdx.topK(Seq(1L, 2L, 3L), k = 10, nProbe = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Similarity.rrfFuse(Seq(bm, ann), k = 5)
        .orderBy("query_id", "rank")
    }),

    // CCNet-style bigram-LM quality scoring: stupid-backoff model trained
    // on the English slice, every doc scored by mean per-bigram logprob
    "llm_ngram_lm" -> ((s, d) => {
      val all = docs(s, d)
      TextOps.ngramLmScore(all, "doc_id", "text",
          all.filter(col("lang") === "en"), "text")
        .select(col("doc_id"), col("lm_logprob"))
        .orderBy("doc_id")
    }),

    // CCNet head/middle/tail perplexity bucketing: LM scores quantiled
    // into 3 buckets (exact percentile mode for the oracle replay)
    "llm_ppl_buckets" -> ((s, d) => {
      val all = docs(s, d)
      TextOps.perplexityBuckets(all, "doc_id", "text",
          all.filter(col("lang") === "en"), "text", nBuckets = 3,
          exact = true)
        .select(col("doc_id"), col("lm_logprob"), col("ppl_bucket"))
        .orderBy("doc_id")
    }),

    // DSIR-style data selection: hashed-unigram importance ratios vs a
    // French target slice, greedy top-50 (rounded-score rank, id ties)
    "llm_dsir_select" -> ((s, d) => {
      val all = docs(s, d)
      graft.llm.Sampling.selectByImportance(
          all, "doc_id", "text", all.filter(col("lang") === "fr"), "text",
          k = 50, buckets = 4096, alpha = 1.0)
        .select(col("doc_id"), col("importance"))
        .orderBy("doc_id")
    }),

    // the Gopher document-quality rule set: per-rule metrics + verdict
    "llm_gopher" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), TextOps.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
          col("g.symbol_ratio"), col("g.bullet_line_ratio"),
          col("g.ellipsis_line_ratio"), col("g.alpha_word_ratio"),
          col("g.stopword_hits"), col("g.passes"))
        .orderBy("doc_id")
    }),

    // BPE trainer surface, oracle-able half: iteration-0 adjacent-pair
    // frequencies over the word table (chars + </w>), top 20 — pins the
    // counting machinery every merge iteration reuses. Symbols never
    // contain a space, so "l r" is a lossless pair key
    "llm_bpe_pairs" -> ((s, d) => {
      graft.llm.Bpe.pairCounts(graft.llm.Bpe.wordTable(docs(s, d), "text"))
        .select(concat(col("l"), lit(" "), col("r")).as("pair"), col("freq"))
        .orderBy(desc("freq"), col("pair"))
        .limit(20)
    }),

    // full BPE merge table: iterative argmax (each merge rewrites the word
    // table the next count runs over) is not one-SQL-expressible → rows-only
    // here; LlmSpec pins EXACT merge-table parity against an independent
    // sequential reference implementation
    "llm_bpe_train" -> ((s, d) => {
      trainedBpe(s, d).orderBy("rank")
    }),

    // encode under the trained tokenizer: per-doc subword token counts —
    // the number that prices documents into a mix. Rank-order merge
    // application is the trainer's own operation sequence → rows-only;
    // LlmSpec pins parity against the distributed mergePair fold and a
    // sequential reference encoder
    "llm_bpe_encode" -> ((s, d) => {
      val merges = graft.llm.Bpe.collectMerges(trainedBpe(s, d))
      docs(s, d).select(col("doc_id"),
          graft.llm.Bpe.tokenCount(col("text"), merges).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // per-benchmark contamination audit over the same eval slice, cut into
    // three benchmarks: who leaked, how much, per eval set
    "llm_contamination" -> ((s, d) => {
      val all = docs(s, d)
      val evalSet = all.filter(col("doc_id") % 50 === 0)
        .withColumn("bench", concat(lit("b"), (col("doc_id") % 3).cast("string")))
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      Dedup.contaminationReport(corpus, "doc_id", "text",
          evalSet, "bench", "doc_id", "text", n = 3)
        .orderBy("bench")
    }),

    // multimodal: binary payload column + size/checksum metadata (the
    // SQL-checkable half; stubbed decode fields are state-tested)
    "llm_mm_meta" -> ((s, d) => {
      val packed = Multimodal.packFakeMedia(docs(s, d), "text")
      Multimodal.extractMeta(packed, "media")
        .select(col("doc_id"), col("meta.size_bytes").as("size_bytes"),
          col("meta.checksum").as("checksum"))
        .orderBy("doc_id")
    }),

    // sequence packing: bin documents into 80-token training sequences
    // (shard-local FFD — llm/Packing.scala). Bin ASSIGNMENT is shard-layout-
    // dependent, so the oracled result is the exact conservation profile:
    // every doc packed exactly once, token totals preserved, budget held
    "llm_packing" -> ((s, d) => {
      val budget = 80
      val packed = graft.llm.Packing.packSequences(
        docs(s, d), "doc_id", TextOps.tokenCount(col("text")), budget, shards = 8)
      val bins = graft.llm.Packing.packedBins(packed, budget)
      bins.agg(
        sum("n_docs").cast("long").as("n_docs"),
        sum("bin_tokens").cast("long").as("total_tokens"),
        sum(when(col("oversized"), col("n_docs")).otherwise(lit(0L)))
          .cast("long").as("oversized_docs"),
        (coalesce(max(when(!col("oversized"), col("bin_tokens"))), lit(0L))
          <= budget).as("within_budget"))
    }),

    // deterministic training-mix resampling: per-language rates, integer-
    // arithmetic keep/copy decision → byte-exact across engines (the oracle
    // replays the same residue formula in SQL)
    "llm_mix_sampling" -> ((s, d) => {
      graft.llm.Sampling.sampleByDomain(
          docs(s, d).select("doc_id", "lang"), "doc_id", "lang",
          Map("en" -> 1.5, "fr" -> 0.25, "zh" -> 0.0),
          defaultWeight = 0.5, seed = 7L)
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    }),

    // per-domain token-budget admission: each source keeps its deterministic
    // shuffle-order prefix until the 800-token budget is exhausted;
    // cum_tokens is part of the contract (the oracle replays the
    // single-window equivalent of the two-phase prefix sum)
    "llm_token_budget" -> ((s, d) => {
      graft.llm.Sampling.tokenBudgetMix(
          docs(s, d), "doc_id", "source",
          graft.llm.TextOps.tokenCount(col("text")),
          budgetTokens = 800L, seed = 5L, rangeBuckets = 8)
        .select(col("doc_id"), col("source"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // per-domain token budgets — the production mix shape ("600 tokens of
    // src0, nothing from src7, 250 by default"); same two-phase prefix sum,
    // only the admission threshold becomes a per-domain lookup
    "llm_token_budget_domains" -> ((s, d) => {
      graft.llm.Sampling.tokenBudgetMix(
          docs(s, d), "doc_id", "source",
          graft.llm.TextOps.tokenCount(col("text")),
          budgets = Map("src0" -> 600L, "src1" -> 150L, "src7" -> 0L),
          defaultBudget = 250L, seed = 5L, rangeBuckets = 8,
          broadcastOffsets = true)
        .select(col("doc_id"), col("source"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // int8-quantized ANN through the PERSISTED index — the production path
    // (codes persisted at build, ranking scan over the 4×-smaller codes
    // column, exact cosine only on k×4 survivors). Quantization rounding is
    // representation-specific → rows-only here; recall gate + parity with
    // the one-shot form in LlmSpec
    "llm_ann_int8" -> ((s, d) => {
      // one index build per (session, data dir) per JVM: a registry query
      // must stay repeatable without leaking a fresh /tmp index per call
      val idx = Int8IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-ivf8-")
            .toString + "/idx"
          graft.llm.IvfIndex.build(s, embs(s, d), "vec_id", "embedding",
            loc, nLists = 8)
        })
      idx.topKQuantized(AnnQueryIds, k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // product-quantized ANN (Jégou et al. 2011): the ranking phase scans
    // M-byte residual codes (32× fewer bytes than the float vectors for
    // 64-dim/M=8) and sums M table lookups per candidate (ADC), then the
    // exact rescore runs on the bounded survivor set. Codebook contents
    // are quantization-specific → rows-only; exactness-under-full-rescore
    // and the recall gate live in LlmSpec
    "llm_ann_pq" -> ((s, d) => {
      val idx = Int8IndexCache.computeIfAbsent(
        "pq:" + System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-ivfpq-")
            .toString + "/idx"
          graft.llm.IvfIndex.buildPq(s, embs(s, d), "vec_id", "embedding",
            loc, nLists = 8, m = 16, ks = 64)
        })
      idx.topKPq(AnnQueryIds, k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // distributed batch kNN JOIN: every 25th corpus vector (a whole
    // DataFrame of queries — never collected to the driver) joined
    // against the index for its top-3; full probe ⇒ exact, so the oracle
    // is the brute-force cross-join replay
    "llm_knn_join" -> ((s, d) => {
      val idx = Int8IndexCache.computeIfAbsent(
        System.identityHashCode(s) + "#" + d, _ => {
          val loc = java.nio.file.Files.createTempDirectory("graft-ivf8-")
            .toString + "/idx"
          graft.llm.IvfIndex.build(s, embs(s, d), "vec_id", "embedding",
            loc, nLists = 8)
        })
      val queries = embs(s, d).filter(col("vec_id") % 25 === 0)
      idx.knnJoin(queries, "vec_id", "embedding", k = 3, nProbe = 8,
          excludeSelf = true)
        .orderBy("query_id", "rank")
    })
  )

  private val Int8IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.llm.IvfIndex]()

  private val Bm25IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.llm.Bm25Index]()

  // one BPE training run per (session, data dir): llm_bpe_train and
  // llm_bpe_encode share the merge table instead of retraining
  private val BpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def trainedBpe(s: SparkSession, d: String): DataFrame =
    BpeCache.computeIfAbsent(System.identityHashCode(s) + "#" + d,
      _ => graft.llm.Bpe.train(docs(s, d), "text", numMerges = 25)
        .cache())

  /** DuckDB-dialect oracles (driver runs them in DuckDB only). */
  val oracle: Map[String, String] = {
    val shingles =
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
        | s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        |   THEN list_transform(range(1, len(toks)-1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |   ELSE [] END) sh FROM t)""".stripMargin.replace("\n", " ")
    val pairSql =
      s"""$shingles SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         | FROM s a, s b WHERE a.doc_id < b.doc_id
         |   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
         | ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")
    val base = Map(
      "llm_dedup_exact" ->
        ("SELECT min(doc_id) AS keep_id, count(*) AS n FROM documents " +
          "GROUP BY text ORDER BY keep_id"),
      "llm_dedup_ngram" -> pairSql,
      "llm_dedup_minhash" -> pairSql,
      "llm_dedup_cc" ->
        (s"""$shingles, p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           | FROM s a, s b WHERE a.doc_id < b.doc_id
           |   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
           | e AS (SELECT id_a u, id_b v FROM p UNION SELECT id_b, id_a FROM p),
           | walk(u, v) AS (SELECT u, v FROM e
           |   UNION SELECT w.u, e2.v FROM walk w JOIN e e2 ON w.v = e2.u),
           | comp AS (SELECT u AS doc_id, least(u, min(v)) AS component
           |   FROM walk GROUP BY u)
           | SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
           | FROM documents d LEFT JOIN comp c USING (doc_id) ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")
          .replaceFirst("^WITH ", "WITH RECURSIVE ")),
      "llm_dup_fraction" ->
        (s"""$shingles, x AS (SELECT doc_id, unnest(sh) AS g FROM s),
           | f AS (SELECT g, count(*) AS dn FROM x GROUP BY g),
           | pd AS (SELECT x.doc_id, CAST(count(*) AS BIGINT) AS ngrams,
           |   CAST(sum(CASE WHEN f.dn >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS duplicated
           |   FROM x JOIN f USING (g) GROUP BY x.doc_id)
           | SELECT d.doc_id, coalesce(pd.ngrams, 0) AS ngrams,
           |   coalesce(pd.duplicated, 0) AS duplicated,
           |   round(coalesce(CAST(pd.duplicated AS DOUBLE)
           |     / greatest(pd.ngrams, 1), 0.0), 6) AS dup_fraction
           | FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_normalize" ->
        ("SELECT doc_id, nfc_normalize(text) AS text, " +
          "(text <> nfc_normalize(text)) AS changed " +
          "FROM documents ORDER BY doc_id"),
      "llm_extract" ->
        ("""WITH h AS (SELECT doc_id,
           |   '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
           |   || '</title><style type="text/css">p { color: red; }</style>'
           |   || '<script>if (x < 1) { alert("&amp;"); }</script></head>'
           |   || '<!-- hidden <p> comment --><body><h1>Heading &amp; more</h1><p>'
           |   || replace(replace(text, '<', '('), '&', '+')
           |   || '&nbsp;tail &lt;kept&gt; &#39;q&#39; &unknown; x</p>'
           |   || '<div>  spaced   <b>bold</b>   run  </div>'
           |   || '<![CDATA[ dropped ]]>'
           |   || '<ul><li>item one</li><li>item two</li></ul></body></html>' AS html
           |   FROM documents),
           | s1 AS (SELECT doc_id, regexp_replace(html, '<!--.*?-->', '', 'gs') AS t FROM h),
           | s2 AS (SELECT doc_id, regexp_replace(t, '<!\[CDATA\[.*?\]\]>', '', 'gs') AS t FROM s1),
           | s3 AS (SELECT doc_id, regexp_replace(t, '<script\b[^>]*>.*?</script[^>]*>', '', 'gis') AS t FROM s2),
           | s4 AS (SELECT doc_id, regexp_replace(t, '<style\b[^>]*>.*?</style[^>]*>', '', 'gis') AS t FROM s3),
           | s5 AS (SELECT doc_id, regexp_replace(t,
           |   '</?(br|p|div|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|pre|section|article|header|footer|nav|title)\b[^>]*>',
           |   chr(10), 'gi') AS t FROM s4),
           | s6 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', '', 'g') AS t FROM s5),
           | s7 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(t,
           |   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
           |   '&nbsp;', ' '), '&amp;', '&') AS t FROM s6),
           | s8 AS (SELECT doc_id, regexp_replace(t, '[ \t\r\f\v]+', ' ', 'g') AS t FROM s7),
           | s9 AS (SELECT doc_id, regexp_replace(t, ' ?(\n ?)+', chr(10), 'g') AS t FROM s8)
           | SELECT doc_id, trim(t, ' ' || chr(10)) AS text FROM s9 ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_span_dedup" ->
        ("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
           | pr AS (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS p
           |   FROM t WHERE len(toks) >= 3),
           | pg AS (SELECT doc_id, p,
           |   concat_ws(' ', toks[p], toks[p+1], toks[p+2]) AS g FROM pr),
           | dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS dn
           |   FROM pg GROUP BY g) WHERE dn >= 2),
           | cov AS (SELECT DISTINCT doc_id, i FROM (SELECT pg.doc_id,
           |   pg.p + unnest([0,1,2]) AS i FROM pg JOIN dup USING (g))),
           | tk AS (SELECT doc_id, unnest(toks) AS tok,
           |   unnest(range(1, len(toks)+1)) AS i FROM t),
           | kept AS (SELECT tk.doc_id, tk.i, tk.tok FROM tk
           |   LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.i = cov.i
           |   WHERE cov.i IS NULL),
           | agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_n,
           |   string_agg(tok, ' ' ORDER BY i) AS text2 FROM kept GROUP BY doc_id)
           | SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |   CAST(len(toks) - coalesce(agg.kept_n, 0) AS BIGINT) AS removed_tokens,
           |   coalesce(agg.text2, '') AS text
           | FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_leakage_split" ->
        (s"""$shingles, p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           | FROM s a, s b WHERE a.doc_id < b.doc_id
           |   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
           | e AS (SELECT id_a u, id_b v FROM p UNION SELECT id_b, id_a FROM p),
           | walk(u, v) AS (SELECT u, v FROM e
           |   UNION SELECT w.u, e2.v FROM walk w JOIN e e2 ON w.v = e2.u),
           | comp AS (SELECT u AS doc_id, least(u, min(v)) AS component
           |   FROM walk GROUP BY u),
           | c AS (SELECT d.doc_id,
           |   CAST(coalesce(cc.component, d.doc_id) AS BIGINT) AS component
           |   FROM documents d LEFT JOIN comp cc USING (doc_id))
           | SELECT doc_id, component,
           |   CASE WHEN v < 3865470566 THEN 'train'
           |        WHEN v < 4080218931 THEN 'val' ELSE 'test' END AS split
           | FROM (SELECT doc_id, component,
           |   CAST('0x' || substr(md5(CAST(component AS VARCHAR) || ':7'), 1, 8) AS BIGINT) AS v
           |   FROM c) ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")
          .replaceFirst("^WITH ", "WITH RECURSIVE ")),
      "llm_source_overlap" ->
        (s"""$shingles, p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           | FROM s a, s b WHERE a.doc_id < b.doc_id
           |   AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           |     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6)
           | SELECT least(da.source, db.source) AS group_a,
           |   greatest(da.source, db.source) AS group_b,
           |   CAST(count(*) AS BIGINT) AS pair_count,
           |   CAST(count(DISTINCT CASE WHEN da.source <= db.source
           |     THEN p.id_a ELSE p.id_b END) AS BIGINT) AS docs_a,
           |   CAST(count(DISTINCT CASE WHEN da.source <= db.source
           |     THEN p.id_b ELSE p.id_a END) AS BIGINT) AS docs_b
           | FROM p JOIN documents da ON p.id_a = da.doc_id
           |   JOIN documents db ON p.id_b = db.doc_id
           | GROUP BY 1, 2 ORDER BY group_a, group_b"""
          .stripMargin.replace("\n", " ")),
      "llm_quality_calibrate" ->
        ("WITH q AS (SELECT doc_id, source, round((" +
          "(CASE WHEN len(string_split(lower(text), ' ')) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) + " +
          "(CASE WHEN CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END) + " +
          "(CASE WHEN CAST(length(text) AS DOUBLE) / greatest(len(string_split(lower(text), ' ')), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)" +
          ") / 3.0, 4) AS quality FROM documents) " +
          "SELECT doc_id, source, quality, " +
          "round(percent_rank() OVER (PARTITION BY source ORDER BY quality), 6) AS calibrated " +
          "FROM q ORDER BY doc_id"),
      "llm_shard_shuffle" ->
        ("SELECT doc_id, CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) AS BIGINT) % 8 AS INT) AS shard, " +
          "md5(CAST(doc_id AS VARCHAR) || ':42') AS sort_key " +
          "FROM documents ORDER BY shard, sort_key"),
      // thresholds are floor(cum_fraction × 2^32) for (0.9, 0.05, 0.05) —
      // the same IEEE-double arithmetic Sampling.assignSplit runs
      "llm_split" ->
        ("SELECT doc_id, CASE WHEN v < 3865470566 THEN 'train' " +
          "WHEN v < 4080218931 THEN 'val' ELSE 'test' END AS split FROM " +
          "(SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8) AS BIGINT) AS v " +
          "FROM documents) ORDER BY doc_id"),
      "llm_decontaminate" ->
        (s"$shingles SELECT c.doc_id FROM s c " +
          "WHERE c.doc_id % 50 != 0 " +
          "AND NOT EXISTS (SELECT 1 FROM s e WHERE e.doc_id % 50 = 0 " +
          "AND len(list_intersect(c.sh, e.sh)) > 0) " +
          "ORDER BY c.doc_id"),
      "llm_corpus_report" ->
        ("SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens, " +
          "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
          "CAST(count(DISTINCT source) AS BIGINT) AS n_sources, " +
          "round(1.0 - CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), " +
          "'\\s+', ' ', 'g')))) AS DOUBLE) / count(*), 4) AS exact_dup_rate, " +
          "quantile_cont(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 0.5) " +
          "  AS p50_tokens, " +
          "quantile_cont(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 0.9) " +
          "  AS p90_tokens " +
          "FROM documents"),
      "llm_bm25" ->
        ("""WITH q(query_id, qtext) AS (VALUES (1, 'hash join merge'),
           |   (2, 'fast scan filter'), (3, 'customer order data')),
           | ct AS (SELECT doc_id,
           |   list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents),
           | post AS (SELECT doc_id, w, count(*) AS tf, max(dl) AS dl FROM
           |   (SELECT doc_id, unnest(ts) AS w, len(ts) AS dl FROM ct)
           |   GROUP BY doc_id, w),
           | qt AS (SELECT DISTINCT query_id, w FROM
           |   (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS w FROM q)),
           | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |   greatest(avg(len(ts)), 1e-9) AS avgdl FROM ct),
           | m AS (SELECT p.* FROM post p WHERE p.w IN (SELECT w FROM qt)),
           | dfc AS (SELECT w, count(*) AS df FROM m GROUP BY 1),
           | sc AS (SELECT qt.query_id, m.doc_id,
           |   round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
           |     * (m.tf * 2.2)
           |     / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))), 4) AS score
           |   FROM m JOIN qt USING (w) JOIN dfc USING (w), stats s GROUP BY 1, 2),
           | r AS (SELECT query_id, doc_id, score, row_number() OVER
           |   (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc)
           | SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
           |   doc_id, score FROM r WHERE rank <= 10 ORDER BY query_id, rank"""
          .stripMargin.replace("\n", " ")),
      "llm_hybrid_retrieval" ->
        ("""WITH q(query_id, qtext) AS (VALUES (1, 'hash join merge'),
           |   (2, 'fast scan filter'), (3, 'customer order data')),
           | ct AS (SELECT doc_id,
           |   list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents),
           | post AS (SELECT doc_id, w, count(*) AS tf, max(dl) AS dl FROM
           |   (SELECT doc_id, unnest(ts) AS w, len(ts) AS dl FROM ct)
           |   GROUP BY doc_id, w),
           | qt AS (SELECT DISTINCT query_id, w FROM
           |   (SELECT query_id, unnest(string_split(lower(qtext), ' ')) AS w FROM q)),
           | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |   greatest(avg(len(ts)), 1e-9) AS avgdl FROM ct),
           | m AS (SELECT p.* FROM post p WHERE p.w IN (SELECT w FROM qt)),
           | dfc AS (SELECT w, count(*) AS df FROM m GROUP BY 1),
           | sc AS (SELECT qt.query_id, m.doc_id,
           |   round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
           |     * (m.tf * 2.2)
           |     / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))), 4) AS score
           |   FROM m JOIN qt USING (w) JOIN dfc USING (w), stats s GROUP BY 1, 2),
           | bmr AS (SELECT query_id, doc_id, row_number() OVER
           |   (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc),
           | vq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
           |   FROM embeddings WHERE vec_id IN (1, 2, 3)),
           | annr AS (SELECT query_id, e.vec_id AS doc_id,
           |   row_number() OVER (PARTITION BY query_id ORDER BY
           |     round(list_cosine_similarity(qvec, CAST(e.embedding AS DOUBLE[])), 4)
           |     DESC, e.vec_id) AS rank
           |   FROM vq, embeddings e WHERE e.vec_id != vq.query_id
           |   QUALIFY rank <= 10),
           | u AS (SELECT query_id, doc_id, rank FROM bmr WHERE rank <= 10
           |   UNION ALL SELECT query_id, doc_id, rank FROM annr),
           | f AS (SELECT query_id, doc_id,
           |   round(sum(1.0 / (60 + rank)), 6) AS score FROM u GROUP BY 1, 2),
           | r AS (SELECT query_id, doc_id, score, row_number() OVER
           |   (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM f)
           | SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
           |   doc_id, score FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
          .stripMargin.replace("\n", " ")),
      "llm_ngram_lm" ->
        ("""WITH ct AS (SELECT doc_id,
           |   list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents),
           | tt AS (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents WHERE lang = 'en'),
           | uni AS (SELECT w, count(*) AS c FROM
           |   (SELECT unnest(ts) AS w FROM tt) GROUP BY 1),
           | tot AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n,
           |   CAST(count(*) AS DOUBLE) AS v FROM uni),
           | bi AS (SELECT p, count(*) AS c12 FROM
           |   (SELECT unnest(list_transform(range(1, len(ts)),
           |      i -> ts[i] || ' ' || ts[i+1])) AS p FROM tt) GROUP BY 1),
           | cb AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
           |   i -> ts[i] || ' ' || ts[i+1])) AS p FROM ct),
           | s AS (SELECT cb.doc_id,
           |   CASE WHEN b.c12 IS NOT NULL THEN CAST(b.c12 AS DOUBLE) / u1.c
           |        ELSE 0.4 * (coalesce(u2.c, 0) + 1.0) / (t.n + 1.0 * t.v) END AS s
           |   FROM cb LEFT JOIN bi b USING (p)
           |   LEFT JOIN uni u1 ON u1.w = string_split(cb.p, ' ')[1]
           |   LEFT JOIN uni u2 ON u2.w = string_split(cb.p, ' ')[2], tot t),
           | sc AS (SELECT doc_id, round(avg(ln(s)), 4) AS lm_logprob
           |   FROM s GROUP BY 1)
           | SELECT d.doc_id, sc.lm_logprob FROM documents d
           | LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_ppl_buckets" ->
        ("""WITH ct AS (SELECT doc_id,
           |   list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents),
           | tt AS (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS ts
           |   FROM documents WHERE lang = 'en'),
           | uni AS (SELECT w, count(*) AS c FROM
           |   (SELECT unnest(ts) AS w FROM tt) GROUP BY 1),
           | tot AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n,
           |   CAST(count(*) AS DOUBLE) AS v FROM uni),
           | bi AS (SELECT p, count(*) AS c12 FROM
           |   (SELECT unnest(list_transform(range(1, len(ts)),
           |      i -> ts[i] || ' ' || ts[i+1])) AS p FROM tt) GROUP BY 1),
           | cb AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
           |   i -> ts[i] || ' ' || ts[i+1])) AS p FROM ct),
           | s AS (SELECT cb.doc_id,
           |   CASE WHEN b.c12 IS NOT NULL THEN CAST(b.c12 AS DOUBLE) / u1.c
           |        ELSE 0.4 * (coalesce(u2.c, 0) + 1.0) / (t.n + 1.0 * t.v) END AS s
           |   FROM cb LEFT JOIN bi b USING (p)
           |   LEFT JOIN uni u1 ON u1.w = string_split(cb.p, ' ')[1]
           |   LEFT JOIN uni u2 ON u2.w = string_split(cb.p, ' ')[2], tot t),
           | sc AS (SELECT doc_id, round(avg(ln(s)), 4) AS lm_logprob
           |   FROM s GROUP BY 1),
           | q AS (SELECT quantile_cont(lm_logprob, 2.0/3.0) AS c1,
           |   quantile_cont(lm_logprob, 1.0/3.0) AS c2 FROM sc)
           | SELECT d.doc_id, sc.lm_logprob,
           |   CAST(CASE WHEN sc.lm_logprob >= q.c1 THEN 1
           |        WHEN sc.lm_logprob >= q.c2 THEN 2 ELSE 3 END AS INT) AS ppl_bucket
           | FROM documents d LEFT JOIN sc USING (doc_id), q
           | ORDER BY d.doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_dsir_select" ->
        ("""WITH tok AS (SELECT doc_id, t FROM
           |  (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
           |   FROM documents) WHERE t != ''),
           | tb AS (SELECT doc_id,
           |   CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096 AS b FROM tok),
           | tgt AS (SELECT CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096 AS b
           |   FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
           |         FROM documents WHERE lang = 'fr') WHERE t != ''),
           | rc AS (SELECT b, count(*) AS rc FROM tb GROUP BY 1),
           | tc AS (SELECT b, count(*) AS tc FROM tgt GROUP BY 1),
           | tot AS (SELECT (SELECT count(*) FROM tb) AS rt,
           |   (SELECT count(*) FROM tgt) AS tt),
           | lr AS (SELECT rc.b,
           |   ln((coalesce(tc.tc, 0) + 1.0) / (tt + 4096.0))
           |   - ln((rc.rc + 1.0) / (rt + 4096.0)) AS lr
           |   FROM rc LEFT JOIN tc USING (b), tot),
           | sc AS (SELECT tb.doc_id, round(avg(lr.lr), 4) AS importance
           |   FROM tb JOIN lr ON tb.b = lr.b GROUP BY 1),
           | sel AS (SELECT d.doc_id, coalesce(sc.importance, 0.0) AS importance
           |   FROM documents d LEFT JOIN sc USING (doc_id)
           |   ORDER BY importance DESC, d.doc_id LIMIT 50)
           | SELECT doc_id, importance FROM sel ORDER BY doc_id"""
          .stripMargin.replace("\n", " ")),
      "llm_gopher" -> {
        val stops = TextOps.EnStop.map("'" + _ + "'").mkString("[", ",", "]")
        s"""WITH t AS (SELECT doc_id, text,
           |  list_filter(string_split(lower(text), ' '), x -> x != '') AS toks,
           |  string_split(text, chr(10)) AS lines FROM documents),
           | m AS (SELECT doc_id, len(toks) AS n_words,
           |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |    / greatest(len(toks), 1) AS mwl,
           |  (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
           |    + (length(text) - length(replace(text, '...', ''))) / 3.0)
           |    / greatest(len(toks), 1) AS sr,
           |  CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
           |    OR starts_with(ltrim(l), '* '))) AS DOUBLE)
           |    / greatest(len(lines), 1) AS br,
           |  CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
           |    / greatest(len(lines), 1) AS er,
           |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           |    / greatest(len(toks), 1) AS ar,
           |  len(list_intersect(toks, $stops)) AS sh FROM t)
           | SELECT doc_id, CAST(n_words AS INT) AS n_words,
           |  round(mwl, 4) AS mean_word_len, round(sr, 4) AS symbol_ratio,
           |  round(br, 4) AS bullet_line_ratio,
           |  round(er, 4) AS ellipsis_line_ratio,
           |  round(ar, 4) AS alpha_word_ratio, CAST(sh AS INT) AS stopword_hits,
           |  (n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
           |   AND sr <= 0.1 AND br <= 0.9 AND er <= 0.3 AND ar >= 0.8
           |   AND sh >= 2) AS passes
           | FROM m ORDER BY doc_id""".stripMargin.replace("\n", " ")
      },
      "llm_bpe_pairs" ->
        ("""WITH w AS (SELECT t AS word, count(*) AS cnt FROM
           |   (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
           |   WHERE t != '' GROUP BY 1),
           | sy AS (SELECT list_append(list_filter(string_split(word, ''), x -> x != ''),
           |   '</w>') AS s, cnt FROM w),
           | p AS (SELECT unnest(list_transform(range(1, len(s)),
           |   i -> s[i] || ' ' || s[i+1])) AS pair, cnt FROM sy)
           | SELECT pair, CAST(sum(cnt) AS BIGINT) AS freq FROM p
           | GROUP BY 1 ORDER BY freq DESC, pair LIMIT 20"""
          .stripMargin.replace("\n", " ")),
      "llm_contamination" ->
        (s"""$shingles,
           | e AS (SELECT doc_id, 'b' || CAST(doc_id % 3 AS VARCHAR) AS bench, sh
           |   FROM s WHERE doc_id % 50 = 0),
           | c AS (SELECT doc_id, sh FROM s WHERE doc_id % 50 != 0),
           | eh AS (SELECT DISTINCT bench, doc_id, h FROM
           |   (SELECT bench, doc_id, unnest(sh) AS h FROM e)),
           | ch AS (SELECT DISTINCT doc_id, h FROM
           |   (SELECT doc_id, unnest(sh) AS h FROM c)),
           | hit AS (SELECT eh.bench, eh.doc_id AS eid, ch.doc_id AS cid, eh.h
           |   FROM eh JOIN ch USING (h)),
           | tot AS (SELECT bench, count(DISTINCT doc_id) AS eval_docs FROM e GROUP BY 1),
           | agg AS (SELECT bench, count(DISTINCT eid) AS ec,
           |   count(DISTINCT cid) AS cc, count(DISTINCT h) AS hc FROM hit GROUP BY 1)
           | SELECT t.bench, CAST(t.eval_docs AS BIGINT) AS eval_docs,
           |   CAST(coalesce(a.ec, 0) AS BIGINT) AS eval_docs_contaminated,
           |   CAST(coalesce(a.cc, 0) AS BIGINT) AS corpus_docs_hit,
           |   CAST(coalesce(a.hc, 0) AS BIGINT) AS eval_shingles_hit,
           |   round(CAST(coalesce(a.ec, 0) AS DOUBLE) / t.eval_docs, 4)
           |     AS contamination_rate
           | FROM tot t LEFT JOIN agg a USING (bench) ORDER BY bench"""
          .stripMargin.replace("\n", " ")),
      "llm_dedup_embed" ->
        ("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
          "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim " +
          "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
          "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45 " +
          "ORDER BY id_a, id_b"),
      "llm_ann_topk" ->
        ("WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv " +
          "FROM embeddings WHERE vec_id IN (0,1,2,3,4)) " +
          "SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id " +
          "ORDER BY round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) DESC, e.vec_id) AS INT) AS rank, " +
          "e.vec_id AS neighbor_id, " +
          "round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim " +
          "FROM q, embeddings e WHERE e.vec_id != q.query_id " +
          "QUALIFY rank <= 5 ORDER BY query_id, rank"),
      // full-probe IVF is exact ⇒ same oracle as the brute-force baseline
      "llm_ann_ivf" ->
        ("WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv " +
          "FROM embeddings WHERE vec_id IN (0,1,2,3,4)) " +
          "SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id " +
          "ORDER BY round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) DESC, e.vec_id) AS INT) AS rank, " +
          "e.vec_id AS neighbor_id, " +
          "round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim " +
          "FROM q, embeddings e WHERE e.vec_id != q.query_id " +
          "QUALIFY rank <= 5 ORDER BY query_id, rank"),
      // full-probe kNN join is exact ⇒ brute-force cross-join replay
      "llm_knn_join" ->
        ("WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv " +
          "FROM embeddings WHERE vec_id % 25 = 0) " +
          "SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id " +
          "ORDER BY round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) DESC, e.vec_id) AS INT) AS rank, " +
          "e.vec_id AS neighbor_id, " +
          "round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim " +
          "FROM q, embeddings e WHERE e.vec_id != q.query_id " +
          "QUALIFY rank <= 3 ORDER BY query_id, rank"),
      "llm_vocab_topk" ->
        ("SELECT token, count(*) AS freq FROM " +
          "(SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) " +
          "GROUP BY token ORDER BY freq DESC, token LIMIT 100"),
      "llm_tfidf" ->
        ("WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents), " +
          "tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2), " +
          "idf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), " +
          "sc AS (SELECT doc_id, token, round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df), 4) AS score " +
          "FROM tf JOIN idf USING (token)) " +
          "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id " +
          "ORDER BY score DESC, token) AS INT) AS rank, token, score " +
          "FROM sc QUALIFY rank <= 3 ORDER BY doc_id, rank"),
      "llm_passage_dedup" ->
        ("WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents), " +
          "nums AS (SELECT doc_id, t, greatest(1, CAST(ceil(len(t) / 4.0) AS INT)) AS nc FROM toks), " +
          "chunks AS (SELECT doc_id, cidx, array_to_string(t[cidx*4+1 : cidx*4+4], ' ') AS chunk " +
          "FROM (SELECT doc_id, t, unnest(range(nc)) AS cidx FROM nums)), " +
          "rep AS (SELECT chunk FROM chunks GROUP BY chunk HAVING count(*) > 1) " +
          "SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text " +
          "FROM chunks WHERE chunk NOT IN (SELECT chunk FROM rep) " +
          "GROUP BY doc_id ORDER BY doc_id"),
      "llm_text_stats" ->
        ("SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens, " +
          "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe, " +
          "round(CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) " +
          "/ greatest(length(text), 1), 4) AS punct_ratio " +
          "FROM documents ORDER BY doc_id"),
      "llm_langid" -> {
        def hits(words: Seq[String]) =
          s"len(list_intersect(string_split(lower(text), ' '), [${words.map("'" + _ + "'").mkString(",")}]))"
        val en = hits(TextOps.EnStop); val de = hits(TextOps.DeStop)
        val es = hits(TextOps.EsStop); val fr = hits(TextOps.FrStop)
        s"SELECT lang, CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' " +
          s"WHEN $en >= $de AND $en >= $es AND $en >= $fr THEN 'en' " +
          s"WHEN $de >= $es AND $de >= $fr THEN 'de' " +
          s"WHEN $es >= $fr THEN 'es' ELSE 'fr' END AS pred, count(*) AS n " +
          "FROM documents GROUP BY 1, 2 ORDER BY lang, pred"
      },
      "llm_length_filter" ->
        ("WITH t AS (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) tc FROM documents), " +
          "b AS (SELECT quantile_cont(tc, 0.1) lo, quantile_cont(tc, 0.9) hi FROM t) " +
          "SELECT doc_id FROM t, b WHERE tc >= lo AND tc <= hi ORDER BY doc_id"),
      "llm_quality" ->
        ("SELECT doc_id, round((" +
          "(CASE WHEN len(string_split(lower(text), ' ')) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END) + " +
          "(CASE WHEN CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END) + " +
          "(CASE WHEN CAST(length(text) AS DOUBLE) / greatest(len(string_split(lower(text), ' ')), 1) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)" +
          ") / 3.0, 4) AS quality FROM documents ORDER BY doc_id"),
      "llm_fingerprint" ->
        ("SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp " +
          "FROM documents ORDER BY doc_id"),
      "llm_pii_scrub" ->
        ("WITH t AS (SELECT doc_id, text || ' contact: user' || CAST(doc_id AS VARCHAR) " +
          "|| '@example.com via https://ex.com/p?id=' || CAST(doc_id AS VARCHAR) AS dirty FROM documents) " +
          "SELECT doc_id, " +
          "CAST(len(regexp_extract_all(dirty, 'https?://[^\\s]+')) " +
          "+ len(regexp_extract_all(regexp_replace(dirty, 'https?://[^\\s]+', '<URL>', 'g'), " +
          "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_pii, " +
          "regexp_replace(regexp_replace(dirty, 'https?://[^\\s]+', '<URL>', 'g'), " +
          "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed " +
          "FROM t ORDER BY doc_id"),
      "llm_repetition" ->
        ("WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) " +
          "SELECT doc_id, CASE WHEN len(toks) >= 3 THEN " +
          "round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)-1), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS DOUBLE) / (len(toks) - 2), 4) " +
          "ELSE 0.0 END AS rep3 FROM t ORDER BY doc_id"),
      "llm_chunking" ->
        ("WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents), " +
          "c AS (SELECT doc_id, toks, unnest(range(greatest(1, " +
          "CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT)))) AS ci FROM t) " +
          "SELECT doc_id, CAST(ci AS INT) AS chunk_idx, " +
          "CAST(len(toks[ci*48+1 : ci*48+64]) AS INT) AS n_tokens, " +
          "array_to_string(toks[ci*48+1 : ci*48+64], ' ') AS chunk " +
          "FROM c ORDER BY doc_id, chunk_idx"),
      "llm_mm_meta" ->
        ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes, " +
          "substr(lower(hex(encode(text))), 1, 8) AS checksum " +
          "FROM documents ORDER BY doc_id"),
      "llm_packing" ->
        ("SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens, " +
          "CAST(sum(CASE WHEN len(string_split(lower(text), ' ')) > 80 " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS oversized_docs, " +
          "TRUE AS within_budget FROM documents"),
      "llm_mix_sampling" ->
        ("WITH w AS (SELECT doc_id, lang, " +
          "CASE lang WHEN 'en' THEN 1.5 WHEN 'fr' THEN 0.25 " +
          "WHEN 'zh' THEN 0.0 ELSE 0.5 END AS wt FROM documents), " +
          "c AS (SELECT doc_id, lang, CAST(floor(wt) + " +
          "CASE WHEN (doc_id * 48271 + 7) % 65536 < (wt - floor(wt)) * 65536 " +
          "THEN 1 ELSE 0 END AS INT) AS copies FROM w) " +
          "SELECT doc_id, lang, CAST(unnest(range(copies)) AS INT) AS copy " +
          "FROM c WHERE copies > 0 ORDER BY doc_id, copy"),
      "llm_token_budget" ->
        ("SELECT doc_id, source, cum_tokens FROM (" +
          "SELECT doc_id, source, CAST(SUM(len(string_split(lower(text), ' '))) OVER (" +
          "PARTITION BY source ORDER BY " +
          "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 8) AS BIGINT), doc_id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM documents) " +
          "WHERE cum_tokens <= 800 ORDER BY doc_id"),
      "llm_token_budget_domains" ->
        ("SELECT doc_id, source, cum_tokens FROM (" +
          "SELECT doc_id, source, CAST(SUM(len(string_split(lower(text), ' '))) OVER (" +
          "PARTITION BY source ORDER BY " +
          "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 8) AS BIGINT), doc_id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM documents) " +
          "WHERE cum_tokens <= CASE source WHEN 'src0' THEN 600 " +
          "WHEN 'src1' THEN 150 WHEN 'src7' THEN 0 ELSE 250 END ORDER BY doc_id")
      // llm_dedup_simhash / llm_ann_lsh / llm_ann_int8 / llm_ann_pq:
      // hash-family- or quantization-specific → rows-only
    )
    // the persisted indexes answer the SAME queries with the SAME scores
    // as the one-shot ops — one oracle, two implementations
    base + ("llm_bm25_index" -> base("llm_bm25")) +
      ("llm_bm25_join" -> base("llm_bm25")) +
      ("llm_hybrid_indexed" -> base("llm_hybrid_retrieval")) +
      ("llm_span_dedup_sql" -> base("llm_span_dedup"))
  }
}
