package graft

import graft.llm.QualityModel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained model-based quality filter: logistic regression over hashed
  * token features (the fasttext-classifier role in public data recipes).
  * Iterative FP training is not SQL-replayable, so correctness is gated
  * here: held-out AUC, monotone loss, bias-only behavior on empty text,
  * save/load score parity, and tie-averaged AUC arithmetic. */
class QualityModelSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  // The test corpus's metadata labels (lang/source) are drawn independently
  // of the 31-token shared vocabulary — deliberately UNLEARNABLE from text
  // (verified below) — so the learnability gate builds its own labeled set:
  // positives are real documents, negatives are the same documents with
  // every token's characters reversed (disjoint hashed vocabulary, same
  // lengths/structure — only the token identities differ).
  private lazy val labeled = {
    val docs = Tables.load(spark, SparkSessionHelper.sf001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val garbled = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(transform(split(col("text"), " "), t => reverse(t)), " ")
        .as("text"),
      col("source"))
    docs.withColumn("label", lit(1))
      .unionByName(garbled.withColumn("label", lit(0)))
      // deterministic 80/20 split on the md5 id variate — the same
      // engine-reproducible discipline as shard assignment
      .withColumn("_fold",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5)
  }

  test("learns a held-out-separable signal: real-vs-garbled AUC >= 0.95") {
    val train = labeled.filter(col("_fold") =!= 0)
    val test = labeled.filter(col("_fold") === 0)
    val (model, losses) = QualityModel.train(
      train, "doc_id", "text", "label", buckets = 1 << 15, iters = 15)
    val scored = model.score(test, "doc_id", "text")
    val a = QualityModel.auc(scored, "label", "quality_prob")
    assert(a >= 0.95, s"held-out AUC $a")
    // training made progress and the loss curve is a curve, not noise
    assert(losses.head > losses.last * 1.5,
      s"loss barely moved: ${losses.head} -> ${losses.last}")
    assert(losses.last < 0.4, s"final loss ${losses.last}")
    // the model actually separates: mean prob gap between classes
    val gap = scored.groupBy("label").agg(avg("quality_prob").as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(gap(1) - gap(0) > 0.3, s"class means $gap")
  }

  test("an unlearnable label honestly scores at chance, not spuriously high") {
    // lang is assigned independently of the shared 31-token vocabulary:
    // a model that reports signal here is overfitting its split
    val docs = Tables.load(spark, SparkSessionHelper.sf001, "documents")
      .withColumn("is_en", (col("lang") === "en").cast("int"))
      .withColumn("_fold",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5)
    val (model, _) = QualityModel.train(docs.filter(col("_fold") =!= 0),
      "doc_id", "text", "is_en", buckets = 1 << 15, iters = 8)
    val a = QualityModel.auc(
      model.score(docs.filter(col("_fold") === 0), "doc_id", "text"),
      "is_en", "quality_prob")
    assert(a > 0.3 && a < 0.7, s"chance-level task scored AUC $a")
  }

  test("empty text scores exactly sigmoid(bias); save/load is score-stable") {
    val train = labeled.filter(col("_fold") =!= 0).limit(200)
    val (model, _) = QualityModel.train(
      train, "doc_id", "text", "label", buckets = 1 << 12, iters = 5)
    val probe = Seq((1L, ""), (2L, "the quick brown fox")).toDF("doc_id", "text")
    val scored = model.score(probe, "doc_id", "text")
      .orderBy("doc_id").collect()
    val expectEmpty = 1.0 / (1.0 + math.exp(-model.bias))
    assert(math.abs(scored(0).getAs[Double]("quality_prob") - expectEmpty) < 1e-12)

    val dir = java.nio.file.Files.createTempDirectory("graft_qm").toString
    model.save(spark, dir)
    val back = QualityModel.load(spark, dir)
    assert(back.buckets === model.buckets)
    assert(back.bias === model.bias)
    val rescored = back.score(probe, "doc_id", "text").orderBy("doc_id").collect()
    scored.zip(rescored).foreach { case (a, b) =>
      assert(a.getAs[Double]("quality_prob") === b.getAs[Double]("quality_prob"))
    }
  }

  test("AUC: perfect ranking -> 1.0; constant scores tie-average to 0.5") {
    val perfect = Seq((0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)).toDF("y", "s")
    assert(QualityModel.auc(perfect, "y", "s") === 1.0)
    val inverted = Seq((1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)).toDF("y", "s")
    assert(QualityModel.auc(inverted, "y", "s") === 0.0)
    // all-tied scores must give exactly 0.5 — catches naive row_number
    // ranking, which would give an order-dependent wrong answer
    val tied = Seq((0, 0.5), (1, 0.5), (0, 0.5), (1, 0.5)).toDF("y", "s")
    assert(QualityModel.auc(tied, "y", "s") === 0.5)
  }

  test("scoring composes with per-source calibration downstream") {
    val corpus = labeled.filter(col("_fold") =!= 0).limit(300)
    val (model, _) = QualityModel.train(
      corpus, "doc_id", "text", "label", buckets = 1 << 12, iters = 5)
    val scored = model.score(corpus, "doc_id", "text")
    val cal = graft.llm.TextOps.calibrateByGroup(
      scored, col("quality_prob"), "source", "q_rank")
    // percent_rank within each source: bounded [0,1], max 1 per source
    val mx = cal.groupBy("source").agg(max("q_rank").as("m")).collect()
    assert(mx.nonEmpty)
    mx.foreach(r => assert(math.abs(r.getAs[Double]("m") - 1.0) < 1e-12))
  }
}
