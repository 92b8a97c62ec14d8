package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs on sf0.001 and returns rows; every query
  * has an oracle; transform expressions agree with their arithmetic oracles.
  * (Full value-level DuckDB parity is checked by the driver's t2 gate and by
  * scripts/oracle_check.py during development.)
  */
class CoreQueriesSpec extends AnyFunSuite {
  import SparkSessionHelper._

  test("every query has an oracle except the declared probabilistic ops") {
    // hash/quantization families (recall-gated in LlmSpec) plus the BPE
    // pair: iterative argmax training isn't one-SQL-expressible — both are
    // gated by exact parity vs independent reference implementations; the
    // trained quality classifier is iterative-FP for the same reason
    // (AUC/honesty gates live in QualityModelSpec)
    val rowsOnly = Set("llm_ann_lsh", "llm_dedup_simhash", "llm_ann_int8",
      "llm_dedup_embed_ivf", "llm_bpe_train", "llm_bpe_encode",
      "llm_quality_model",
      // PQ codebook contents are quantization-specific; exactness-under-
      // full-rescore + recall gates live in LlmSpec
      "llm_ann_pq")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet === rowsOnly)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ice transform expressions match SQL arithmetic on real data") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf0001, "lineitem")
    val mismatch = li.select(
        graft.functions.ice_truncate(10, col("l_partkey")).as("t"),
        (col("l_partkey") - ((col("l_partkey") % 10 + 10) % 10)).as("e"),
        graft.functions.ice_years(col("l_shipdate")).as("y"),
        (year(col("l_shipdate")) - 1970).as("ye"))
      .filter(col("t") =!= col("e") || col("y") =!= col("ye"))
      .count()
    assert(mismatch === 0)
  }

  test("ice_bucket distributes and is stable") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf0001, "lineitem")
    val buckets = li.select(graft.functions.ice_bucket(8, col("l_orderkey")).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length === 8)
    // spot value: bucket of 34L with n=8 from the spec hash 2017239379
    val one = spark.range(34, 35).select(
      graft.functions.ice_bucket(8, col("id"))).collect()(0).getInt(0)
    assert(one === (2017239379 & Int.MaxValue) % 8)
  }
}
