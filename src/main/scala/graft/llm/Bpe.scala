package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Corpus-scale BPE tokenizer training (the Sennrich et al. 2016
  * subword-unit algorithm — public knowledge; no reference-engine
  * counterpart, this is part of the beyond-the-reference LLM-pipeline
  * surface).
  *
  * Scale shape: the corpus contributes exactly ONE corpus-sized job — the
  * word-frequency aggregation (map-side combine; the result is
  * distinct-words-sized, orders of magnitude below the corpus). Every
  * merge iteration after that runs over the cached word table: a pair
  * count whose shuffle carries only DISTINCT symbol pairs, and a
  * driver-side argmax of ONE collected row. Merge application composes
  * lazily as nested column expressions; every `checkpointEvery` merges
  * the table is eagerly localCheckpoint-ed (lineage truncated, previous
  * blocks released), so plan depth and recompute stay bounded no matter
  * how many merges are requested.
  *
  * Determinism: ties in pair frequency break on (left, right) symbol
  * order, so the merge table is bit-identical across runs and engines —
  * a tokenizer is run provenance, like a shuffle order.
  */
object Bpe {

  /** End-of-word sentinel symbol (its own token, per classic BPE). */
  val EndOfWord = "</w>"

  /** Word-frequency table for a text column: one corpus pass, result is
    * distinct-words-sized. `syms` is the initial character split plus the
    * [[EndOfWord]] sentinel. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(
        array_append(filter(split(col("w"), ""), s => s =!= ""), lit(EndOfWord))
          .as("syms"),
        col("cnt"))

  /** Adjacent-pair frequencies over a symbol-array table: `(l, r, freq)`.
    * The shuffle carries distinct pairs only (map-side combine). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("freq"))

  /** Greedy leftmost, non-overlapping merge of adjacent `(l, r)` into one
    * symbol — the sequential fold BPE specifies ("aaa" + (a,a) → [aa, a];
    * a symbol produced by a merge never re-merges in the same pass). Word
    * symbol arrays are short, so the interpreted fold's quadratic slice
    * cost is bounded by word length, not corpus size. */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Collect a merge table (numMerges rows — driver-small by
    * construction) into the rank-ordered pair list [[encode]] consumes. */
  def collectMerges(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy("rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Encode a text column with trained merges: the per-word subword
    * symbols (rank-order merge application — the exact operation sequence
    * training ran), concatenated across the document. Codegen'd
    * expression with a per-executor distinct-word memo; see
    * [[graft.expressions.BpeEncodeText]]. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(graft.expressions.BpeEncodeText(
      ColumnBridge.expression(text), merges))

  /** Token count under a trained tokenizer — the number that actually
    * prices a document into a training mix (whitespace counts under- and
    * over-shoot by double-digit percents depending on language). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  /** Train `numMerges` BPE merges over `textCol`. Returns the merge table
    * — `(rank, left, right, merged, freq)`, rank 0-based in merge order —
    * which IS the tokenizer (apply ranks in order to encode). Training
    * stops early when the best pair's frequency falls below
    * `minFrequency`. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFrequency: Long = 2L, checkpointEvery: Int = 8): DataFrame = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(minFrequency >= 1, "minFrequency must be positive")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    val spark = df.sparkSession
    // same discipline as Dedup's loops: a configured reliable checkpoint
    // dir survives executor loss on long trainings (and pins no storage
    // blocks); otherwise an eager localCheckpoint
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def reroot(frame: DataFrame): DataFrame =
      if (reliable) frame.checkpoint(true) else frame.localCheckpoint(true)
    var words = reroot(wordTable(df, textCol))
    var lastCheckpoint = words
    val merges = ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = pairCounts(words)
        .orderBy(desc("freq"), col("l"), col("r")).limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minFrequency) match {
        case None => done = true
        case Some(row) =>
          val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((merges.length, l, r, l + r, f))
          words = words.withColumn("syms", mergePair(col("syms"), l, r))
          if (merges.length % checkpointEvery == 0) {
            val next = reroot(words)
            ColumnBridge.unpersistCheckpoint(lastCheckpoint)
            lastCheckpoint = next
            words = next
          }
      }
    }
    ColumnBridge.unpersistCheckpoint(lastCheckpoint)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m._1, m._2, m._3, m._4, m._5)).toSeq, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }
}
