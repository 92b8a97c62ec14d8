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
    * `minFrequency`.
    *
    * Two merge phases, one algorithm (bit-identical output):
    *  - the word table is vocabulary-sized by construction, so when it has
    *    at most `driverMergeMaxWords` distinct words the merge loop runs
    *    DRIVER-LOCAL with incremental pair-count maintenance (the same
    *    small-input fast path as [[Dedup.connectedComponents]]'s
    *    small-graph mode). A per-merge Spark round costs ~1 s of job
    *    scheduling regardless of cluster size, so a production 32k-merge
    *    training would spend hours on round trips while iterating a table
    *    that fits in tens of MB;
    *  - above the threshold (or with `driverMergeMaxWords = 0`) each merge
    *    is a distributed round: a distinct-pairs count, a 1-row argmax,
    *    and a lazy column rewrite, rerooted every `checkpointEvery` merges.
    *    With a reliable checkpoint dir configured, each reroot's
    *    predecessor FILES are deleted as soon as the next reroot
    *    materializes, so long trainings do not accumulate word-table
    *    snapshots on checkpoint storage. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFrequency: Long = 2L, checkpointEvery: Int = 8,
      driverMergeMaxWords: Int = 2000000): DataFrame = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(minFrequency >= 1, "minFrequency must be positive")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(driverMergeMaxWords >= 0, "driverMergeMaxWords must be non-negative")
    val spark = df.sparkSession
    // same discipline as Dedup's loops: a configured reliable checkpoint
    // dir survives executor loss on long trainings (and pins no storage
    // blocks); otherwise an eager localCheckpoint
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def reroot(frame: DataFrame): DataFrame =
      if (reliable) frame.checkpoint(true) else frame.localCheckpoint(true)
    def release(frame: DataFrame): Unit =
      if (reliable) ColumnBridge.reliableCheckpointFile(frame).foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      } else ColumnBridge.unpersistCheckpoint(frame)
    var words = reroot(wordTable(df, textCol))
    // decide the phase with a COUNT (no row transfer) against the
    // materialized reroot, and collect only when under the threshold — an
    // over-threshold vocabulary must not pay a 2M-row driver collect just
    // to be discarded
    val underThreshold = driverMergeMaxWords > 0 &&
      words.limit(driverMergeMaxWords + 1).count() <= driverMergeMaxWords
    if (underThreshold) {
      val collected = words.collect()
      release(words)
      val syms = collected.map(_.getSeq[String](0).toArray)
      val cnts = collected.map(_.getLong(1))
      return mergesToDf(spark, driverMerges(syms, cnts, numMerges, minFrequency))
    }
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
            release(lastCheckpoint)
            lastCheckpoint = next
            words = next
          }
      }
    }
    release(lastCheckpoint)
    mergesToDf(spark, merges.toSeq)
  }

  private def mergesToDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(Int, String, String, String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m._1, m._2, m._3, m._4, m._5)), 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))

  /** UTF-8 byte order (= code-point order) — the comparison UTF8String
    * gives the distributed argmax's tie-break. `String.compareTo` is
    * UTF-16 code-UNIT order, which disagrees for supplementary characters
    * against U+E000..U+FFFF, so the driver loop must not use it. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    var i = 0
    while (i < la && i < lb) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(la - i, lb - i)
  }

  /** The merge loop, driver-local: incremental pair-frequency maintenance
    * (only words CONTAINING the merged pair are touched per round — the
    * standard Sennrich `learn_bpe` bookkeeping) plus a lazy-deletion heap
    * for the argmax, so a 32k-merge training over a few-million-word
    * vocabulary runs in seconds instead of 32k Spark rounds. Tie order and
    * greedy-leftmost merge semantics are EXACTLY the distributed loop's:
    * (freq desc, left, right) under UTF-8 byte comparison, leftmost
    * non-overlapping application per word. */
  private[graft] def driverMerges(words: Array[Array[String]], counts: Array[Long],
      numMerges: Int, minFrequency: Long): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    type Pair = (String, String)
    val pairFreq = mutable.HashMap.empty[Pair, Long]
    // append-only posting lists, validated lazily: a stale index (the word
    // no longer holds the pair) yields a zero delta and is skipped
    val pairWords = mutable.HashMap.empty[Pair, mutable.ArrayBuffer[Int]]
    val ord = new java.util.Comparator[(Long, String, String)] {
      override def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val f = java.lang.Long.compare(y._1, x._1) // freq desc
        if (f != 0) return f
        val l = utf8Compare(x._2, y._2)
        if (l != 0) l else utf8Compare(x._3, y._3)
      }
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](ord)
    def addPairs(syms: Array[String], w: Int, cnt: Long,
        touched: mutable.HashSet[Pair], sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        pairFreq.updateWith(p) {
          case Some(v) => Some(v + sign * cnt)
          case None => Some(sign * cnt)
        }
        if (sign > 0 && w >= 0) {
          val lst = pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int])
          if (lst.isEmpty || lst.last != w) lst += w
        }
        touched += p
        i += 1
      }
    }
    val initTouched = mutable.HashSet.empty[Pair]
    var w = 0
    while (w < words.length) {
      addPairs(words(w), w, counts(w), initTouched, 1L)
      w += 1
    }
    initTouched.foreach(p => heap.add((pairFreq(p), p._1, p._2)))
    val out = ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    while (!done && out.length < numMerges) {
      // lazy deletion: pop until an entry matches the pair's CURRENT count
      var best: (Long, String, String) = null
      while (best == null && !heap.isEmpty) {
        val top = heap.poll()
        if (pairFreq.get((top._2, top._3)).contains(top._1) && top._1 > 0) best = top
      }
      if (best == null || best._1 < minFrequency) done = true
      else {
        val (f, l, r) = best
        out += ((out.length, l, r, l + r, f))
        val touched = mutable.HashSet.empty[Pair]
        val postings = pairWords.getOrElse((l, r), mutable.ArrayBuffer.empty[Int])
        for (wi <- postings) {
          val old = words(wi)
          // stale posting (the word lost the pair in an earlier round)?
          var has = false
          var i = 0
          while (!has && i < old.length - 1) {
            if (old(i) == l && old(i + 1) == r) has = true
            i += 1
          }
          if (has) {
            addPairs(old, -1, counts(wi), touched, -1L) // old adjacencies out
            // greedy-leftmost non-overlapping merge (the mergePair fold)
            val merged = new Array[String](old.length)
            var o = 0
            i = 0
            while (i < old.length) {
              if (o > 0 && merged(o - 1) == l && old(i) == r) merged(o - 1) = l + r
              else { merged(o) = old(i); o += 1 }
              i += 1
            }
            val trimmed = java.util.Arrays
              .copyOf(merged.asInstanceOf[Array[AnyRef]], o).asInstanceOf[Array[String]]
            words(wi) = trimmed
            addPairs(trimmed, wi, counts(wi), touched, 1L) // new adjacencies in
          }
        }
        pairWords.remove((l, r))
        touched.foreach { p =>
          pairFreq.get(p) match {
            case Some(v) if v <= 0 => pairFreq.remove(p)
            case Some(v) => heap.add((v, p._1, p._2))
            case None => ()
          }
        }
        pairFreq.remove((l, r))
      }
    }
    out.toSeq
  }
}
