package graft.llm

import graft.streaming.Streaming
import graft.table.IceTable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest hygiene for a training-data pipeline: the filters a
  * corpus needs BEFORE a document is allowed into the lake, expressed over
  * Structured Streaming so they run continuously as data lands.
  *
  * Split by Spark's streaming plan rules:
  *
  *   - '''In-stream (continuous plan)''': exact dedup. Spark's stateful
  *     `dropDuplicates` is exactly the right operator — the state store
  *     keeps only the key (here one 8-byte fingerprint per unique doc, so
  *     1 B docs ≈ low tens of GB of RocksDB state fleet-wide), partial
  *     batches replay idempotently from the checkpoint, and the watermark
  *     variant bounds state for feeds where duplicates only arrive close
  *     together in event time.
  *   - '''Per-epoch (`foreachBatch`)''': decontamination and near-dup vs
  *     the existing corpus. Both are anti joins of the stream against a
  *     derived match set, and Spark (rightly) refuses stream–stream anti
  *     joins without watermark bounds — but per micro-batch they are plain
  *     batch anti joins with full batch semantics, checkpointed by epoch
  *     and made exactly-once by the epoch-idempotent table sink. This is
  *     the standard production shape for complex per-batch logic.
  *
  * Semantics match the batch operators bit-for-bit: fingerprints are
  * `xxhash64(text)` (same as [[Dedup.exactDedup]] callers), shingles and
  * LSH banding are [[TextOps.shingleHashes]] + [[Dedup.minHashSignatureFromHashes]]
  * — a doc filtered here is exactly a doc the batch pipeline would filter.
  */
object StreamingOps {

  /** 64-bit content fingerprint — the dedup/decontamination join key. */
  def fingerprint(textCol: Column): Column = xxhash64(textCol)

  /** Cross-batch exact dedup on a streaming DataFrame: first sighting of a
    * text wins, every later duplicate (same batch or any later batch) is
    * dropped. State per unique doc is the 8-byte fingerprint only.
    * Unbounded state by design — corpus dedup must remember everything. */
  def dedupExactStream(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("_gf_fp", fingerprint(col(textCol)))
      .dropDuplicates("_gf_fp")
      .drop("_gf_fp")

  /** Watermark-bounded exact dedup: drops duplicates arriving within
    * `delay` (event time) of the first sighting, then FORGETS the key —
    * for at-least-once upstream feeds whose replays cluster in time, where
    * unbounded state is not wanted. `eventTimeCol` must be a timestamp. */
  def dedupExactStreamWithinWatermark(stream: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    stream.withColumn("_gf_fp", fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("_gf_fp")
      .drop("_gf_fp")

  /** Static LSH index over the EXISTING corpus, for filtering new docs
    * against it: one row per (band, bucket) membership carrying the
    * member's shingle-hash set for the exact-Jaccard verify. Build once,
    * write to a table, rebuild on compaction cadence — at 100 TB this is
    * the only corpus-sized job in the ingest path, and it is amortized
    * across every batch that probes it. */
  def corpusLshIndex(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    // same barrier as minHashLshPairs: materialize signatures once instead
    // of letting CollapseProject inline them into every band expression
    corpus.select(col(idCol).as("corpus_id"),
        TextOps.shingleHashes(col(textCol), n).as("sh"))
      .repartition(col("corpus_id"))
      .withColumn("sig", Dedup.minHashSignatureFromHashes(col("sh"), numHashes))
      .select(col("corpus_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
          .as(Seq("band", "bucket")))
  }

  /** Batch-side near-dup filter against a [[corpusLshIndex]]: drops every
    * row of `batch` whose text is a verified near-dup (word-n-gram Jaccard
    * ≥ `threshold`) of SOME indexed corpus doc. Candidate generation is a
    * (band, bucket) equi join — a micro-batch probe side against the
    * bucket-keyed index, so AQE broadcasts the small side — and
    * verification is exact over the shingle-hash sets, so a bucket
    * collision can never drop a clean doc. Parameters must match the ones
    * the index was built with. */
  def nearDupFilterAgainstCorpus(batch: DataFrame, idCol: String,
      textCol: String, index: DataFrame, n: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.6): DataFrame = {
    val numHashes = bands * rowsPerBand
    val base = batch.select(col(idCol).as("_gf_id"),
        TextOps.shingleHashes(col(textCol), n).as("_gf_sh"))
      .repartition(col("_gf_id"))
      .withColumn("_gf_sig",
        Dedup.minHashSignatureFromHashes(col("_gf_sh"), numHashes))
    val probes = base.select(col("_gf_id"), col("_gf_sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("_gf_sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
        .as(Seq("band", "bucket")))
    val nearDupIds = probes
      .join(index, Seq("band", "bucket"))
      // a pair can collide in several bands — dedup before the verify so
      // the expensive set ops run once per candidate pair
      .dropDuplicates("_gf_id", "corpus_id")
      .filter(size(array_intersect(col("_gf_sh"), col("sh"))).cast("double") /
        size(array_union(col("_gf_sh"), col("sh"))).cast("double") >= threshold)
      .select(col("_gf_id").as(idCol)).distinct()
    batch.join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** Per-epoch hygiene: benchmark decontamination (exact n-gram overlap,
    * [[Dedup.decontaminate]]) then near-dup-vs-corpus — both plain batch
    * anti joins here. Either stage is skipped when its reference set is
    * None. */
  def hygieneBatch(batch: DataFrame, idCol: String, textCol: String,
      evalSet: Option[DataFrame], evalTextCol: String = "text",
      corpusIndex: Option[DataFrame] = None, n: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 2, threshold: Double = 0.6): DataFrame = {
    val decontaminated = evalSet.fold(batch)(ev =>
      Dedup.decontaminate(batch, idCol, textCol, ev, evalTextCol, n))
    corpusIndex.fold(decontaminated)(ix =>
      nearDupFilterAgainstCorpus(decontaminated, idCol, textCol, ix,
        n, bands, rowsPerBand, threshold))
  }

  /** `foreachBatch` sink: hygiene-filter each epoch then append it to the
    * table exactly once (epoch-idempotent via [[Streaming.appendOnce]] —
    * a replayed epoch is a no-op). Compose with [[dedupExactStream]]
    * upstream for cross-batch exact dedup:
    * {{{
    * StreamingOps.dedupExactStream(stream, "text").writeStream
    *   .foreachBatch(StreamingOps.hygieneSink(table, "ingest", "doc_id",
    *     "text", Some(evalSet), corpusIndex = Some(index)))
    * }}} */
  def hygieneSink(table: IceTable, queryId: String, idCol: String,
      textCol: String, evalSet: Option[DataFrame] = None,
      evalTextCol: String = "text", corpusIndex: Option[DataFrame] = None,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.6): (DataFrame, Long) => Unit =
    (batch, epochId) => Streaming.appendOnce(table, queryId,
      hygieneBatch(batch, idCol, textCol, evalSet, evalTextCol, corpusIndex,
        n, bands, rowsPerBand, threshold), epochId)

  /** `foreachBatch` sink that keeps the RETRIEVAL INDEXES fresh as data
    * streams in: append each epoch to the corpus table exactly once
    * ([[Streaming.appendOnce]]), then catch the persisted BM25 and/or ANN
    * indexes up to the new corpus snapshot. Per epoch the refreshes are
    * the delta-bounded incremental paths — one small postings append /
    * centroid assignment per micro-batch, never a rebuild (until drift or
    * a DML range trips their own fallbacks). Exactly-once composes for
    * free: a replayed epoch's appendOnce is a no-op, so the corpus
    * snapshot doesn't advance and each refresh returns immediately at
    * its watermark — the sink is idempotent end to end without any state
    * of its own.
    *
    * The indexes must exist (built with `buildFrom` over the SAME corpus
    * table, so the snapshot watermarks line up); queries hitting the
    * index between the corpus append and the refresh see the previous
    * watermark — bounded staleness of one epoch, never wrong results. */
  def indexedIngestSink(corpus: IceTable, queryId: String,
      bm25Location: Option[String] = None,
      annLocation: Option[String] = None,
      hygiene: Option[DataFrame => DataFrame] = None)
      : (DataFrame, Long) => Unit =
    (batch, epochId) => {
      Streaming.appendOnce(corpus, queryId,
        hygiene.fold(batch)(f => f(batch)), epochId)
      val spark = batch.sparkSession
      bm25Location.foreach(loc => Bm25Index.refresh(spark, corpus, loc))
      annLocation.foreach(loc => IvfIndex.refresh(spark, corpus, loc))
    }
}
