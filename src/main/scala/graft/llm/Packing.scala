package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: bin documents into fixed token-budget
  * training sequences so batch assembly wastes minimal padding.
  *
  * Scale shape: packing is inherently sequential, so it runs PER SHARD — one
  * hash `repartition` spreads documents over shards, then each shard packs
  * its documents with first-fit-decreasing in a single `mapPartitions` pass
  * (the justified per-partition-imperative shape: the open-bins table is
  * local mutable state no Column program expresses). Shard-local packing is
  * the standard practice at corpus scale — quality is within a few percent
  * of global FFD, and there is exactly ONE shuffle regardless of corpus
  * size. Bin ids are `shard * 2^40 + localBin`, unique without coordination.
  *
  * Documents LONGER than the budget are emitted as singleton bins with
  * `oversized = true` (callers chunk them first via `TextOps.chunks` if
  * truncation is not acceptable); everything else lands in exactly one bin
  * with `binTokens <= budget` — invariants pinned by LlmSpec and the
  * conservation totals by the `llm_packing` oracle.
  */
object Packing {

  private val ShardShift = 40

  /** Pack each document (identified by `idCol`, sized by `tokenCol` tokens)
    * into bins of at most `budgetTokens`. Returns one row per document:
    * (id, tokens, bin_id, oversized). `shards` bounds per-task state; 0 →
    * keep the incoming partitioning. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: Column,
      budgetTokens: Int, shards: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // fail fast on null ids/sizes (e.g. tokenCount over a null text column):
    // the primitive-tuple encoder below would otherwise NPE mid-job with no
    // hint of which input row was bad
    val sized = docs.select(col(idCol).cast("long").as("id"),
        tokenCol.cast("int").as("tokens"))
      .select(
        when(col("id").isNull, raise_error(lit(
          s"packSequences: null or non-numeric id in column '$idCol'")))
          .otherwise(col("id")).as("id"),
        when(col("tokens").isNull, raise_error(lit(
          "packSequences: null token count (null text column?) — filter or coalesce first")))
          .otherwise(col("tokens")).as("tokens"))
    val sharded =
      if (shards > 0) sized.repartition(shards, col("id")) else sized
    val spark = docs.sparkSession
    import spark.implicits._
    sharded.as[(Long, Int)].mapPartitions { it =>
      val all = it.toArray
      // first-fit-decreasing: biggest docs first, each into the first open
      // bin with room; bins indexed by remaining capacity in a linear scan
      // (shard sizes keep this small; FFD is O(n log n) sort + O(n * bins))
      val sorted = all.sortBy { case (id, tok) => (-tok, id) }
      val binRemaining = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = new Array[(Long, Int, Long, Boolean)](sorted.length)
      val shard = org.apache.spark.TaskContext.getPartitionId().toLong
      var oversizedCount = 0L
      var i = 0
      while (i < sorted.length) {
        val (id, tok) = sorted(i)
        if (tok > budgetTokens) {
          // singleton oversized bin, counted from the top of the id space
          oversizedCount += 1
          out(i) = (id, tok, (shard << ShardShift) | ((1L << ShardShift) - oversizedCount), true)
        } else {
          var b = 0
          while (b < binRemaining.length && binRemaining(b) < tok) b += 1
          if (b == binRemaining.length) binRemaining += budgetTokens
          binRemaining(b) -= tok
          out(i) = (id, tok, (shard << ShardShift) | b.toLong, false)
        }
        i += 1
      }
      out.iterator
    }.toDF("id", "tokens", "bin_id", "oversized")
  }

  /** Bin-level view: (bin_id, n_docs, bin_tokens, oversized, fill_ratio). */
  def packedBins(packed: DataFrame, budgetTokens: Int): DataFrame =
    packed.groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("bin_tokens"),
        max("oversized").as("oversized"))
      .withColumn("fill_ratio",
        round(col("bin_tokens").cast("double") / budgetTokens, 4))
}
