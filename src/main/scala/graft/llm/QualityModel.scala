package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based quality filtering (NEW — no reference counterpart): a
  * trainable logistic-regression classifier over hashed token features,
  * the engine-native analogue of the fasttext-style quality classifiers
  * used by public LLM data recipes (CCNet / GPT-3 / LLaMA-era filtering —
  * public knowledge) to keep "reference-page-like" text. Complements the
  * heuristic battery ([[TextOps.qualityScore]], Gopher rules): heuristics
  * encode fixed judgments; this learns one from labeled examples (curated
  * positives vs crawl negatives) and emits a calibrated probability.
  *
  * Everything is hash-bucketed the same way as [[Sampling.importanceScores]]
  * (md5 token buckets, engine-reproducible): features never materialize a
  * vocabulary, so the model is a fixed `buckets`-sized weight array
  * (~256 KiB at the default 2^15) that broadcasts trivially.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the feature frame is built ONCE — one exchange keyed by doc id
  *    (groupBy doc×bucket with map-side combine, then a per-doc window for
  *    lengths riding the same partitioning) — and persisted across
  *    iterations;
  *  - each training iteration is two bounded aggregations over it: margins
  *    (doc-keyed, reusing the persisted layout) and the gradient (keyed by
  *    BUCKET — at most `buckets` rows survive the map-side combine, so the
  *    gradient collect is model-sized, never corpus-sized);
  *  - the weight table rides to executors as a broadcast join per
  *    iteration, exactly like DSIR's ratio table.
  * Training cost is therefore `iters` × (one cached-frame pass + one
  * model-sized collect); scoring is one explode + broadcast join + doc-
  * keyed sum — the [[Sampling.importanceScores]] plan with learned ratios.
  */
object QualityModel {

  /** A trained hashed-feature linear model: `buckets` md5 feature buckets,
    * a bias, and a (sparse in practice) weight per bucket. */
  final case class HashedLinearModel(buckets: Int, bias: Double,
      weights: Array[Double]) {

    private def weightRows: Seq[(Long, Double)] =
      weights.iterator.zipWithIndex.collect {
        case (w, b) if w != 0.0 => (b.toLong, w)
      }.toSeq

    /** Score `df`: appends `quality_prob` = P(label=1 | text). Documents
      * with no tokens score `sigmoid(bias)`. One explode + broadcast
      * weight join + doc-keyed sum; map-side everything else. */
    def score(df: DataFrame, idCol: String, textCol: String,
        outCol: String = "quality_prob"): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val wDF = weightRows.toDF("_gf_b", "_gf_w")
      val margins = df
        .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("_gf_t"))
        .filter(col("_gf_t") =!= "")
        .select(col(idCol),
          Sampling.tokenBucket(col("_gf_t"), buckets).as("_gf_b"))
        .groupBy(idCol, "_gf_b").agg(count(lit(1)).cast("double").as("_gf_c"))
        .withColumn("_gf_len", sum("_gf_c").over(
          Window.partitionBy(idCol)))
        .join(broadcast(wDF), Seq("_gf_b"), "left")
        .groupBy(idCol)
        .agg(sum(col("_gf_c") / col("_gf_len") *
          coalesce(col("_gf_w"), lit(0.0))).as("_gf_m"))
      df.join(margins, Seq(idCol), "left")
        .withColumn(outCol,
          lit(1.0) / (lit(1.0) + exp(-(coalesce(col("_gf_m"), lit(0.0)) +
            lit(bias)))))
        .drop("_gf_m")
    }

    /** Persist as a weights parquet + one-row JSON meta under `path`. */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      weightRows.toDF("bucket", "weight")
        .repartition(1).write.mode("overwrite").parquet(s"$path/weights")
      Seq((buckets, bias)).toDF("buckets", "bias")
        .repartition(1).write.mode("overwrite").json(s"$path/meta")
    }
  }

  def load(spark: SparkSession, path: String): HashedLinearModel = {
    val meta = spark.read.json(s"$path/meta").head()
    val buckets = meta.getAs[Long]("buckets").toInt
    val w = new Array[Double](buckets)
    spark.read.parquet(s"$path/weights").collect().foreach { r =>
      w(r.getAs[Long]("bucket").toInt) = r.getAs[Double]("weight")
    }
    HashedLinearModel(buckets, meta.getAs[Double]("bias"), w)
  }

  /** Train by Adagrad-stepped logistic regression on hashed-unigram term
    * frequencies. `labeled` needs a unique `idCol`, a text column, and a
    * 0/1 `labelCol`. Returns the model and the per-iteration mean log-loss
    * (callers assert it decreases; a flat curve means a bad `lr`).
    *
    * Documents whose text has no tokens carry no feature signal and are
    * excluded from training (they score `sigmoid(bias)` at inference).
    * Feature values are per-doc term frequencies (count/len), so long
    * documents do not out-weigh short ones — the same per-token
    * normalization argument as [[Sampling.importanceScores]]. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 1 << 15, iters: Int = 20,
      lr: Double = 0.5, l2: Double = 1e-6)
      : (HashedLinearModel, Seq[Double]) = {
    require(buckets > 0, "buckets must be positive")
    require(iters > 0, "iters must be positive")
    val spark = labeled.sparkSession
    import spark.implicits._

    // one corpus pass: (doc, bucket, tf, label); the per-doc length window
    // rides the groupBy's doc-keyed partitioning (no second exchange)
    val feats = labeled
      .select(col(idCol).as("_gf_id"),
        col(labelCol).cast("double").as("_gf_y"),
        explode(TextOps.tokens(col(textCol))).as("_gf_t"))
      .filter(col("_gf_t") =!= "")
      .groupBy(col("_gf_id"), col("_gf_y"),
        Sampling.tokenBucket(col("_gf_t"), buckets).as("_gf_b"))
      .agg(count(lit(1)).cast("double").as("_gf_c"))
      .withColumn("_gf_x",
        col("_gf_c") / sum("_gf_c").over(Window.partitionBy("_gf_id")))
      .select("_gf_id", "_gf_y", "_gf_b", "_gf_x")
      .persist()
    val nDocs = feats.select("_gf_id").distinct().count().toDouble
    require(nDocs > 0, "no trainable documents (all texts empty?)")

    val w = new Array[Double](buckets)
    val g2 = new Array[Double](buckets) // Adagrad accumulators
    var bias = 0.0
    var biasG2 = 0.0
    val eps = 1e-8
    val losses = Seq.newBuilder[Double]

    try {
      var it = 0
      while (it < iters) {
        val wDF = w.iterator.zipWithIndex
          .collect { case (v, b) if v != 0.0 => (b.toLong, v) }
          .toSeq.toDF("_gf_b", "_gf_w")
        // per-doc error e = sigmoid(margin) - y; persisted because both the
        // bucket gradient and the bias/loss aggregate read it
        val errs = feats
          .join(broadcast(wDF), Seq("_gf_b"), "left")
          .groupBy("_gf_id", "_gf_y")
          .agg(sum(col("_gf_x") * coalesce(col("_gf_w"), lit(0.0))).as("_gf_m"))
          .select(col("_gf_id"), col("_gf_y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("_gf_m") + lit(bias)))))
              .as("_gf_p"))
          .select(col("_gf_id"), (col("_gf_p") - col("_gf_y")).as("_gf_e"),
            (-(col("_gf_y") * log(greatest(col("_gf_p"), lit(1e-12))) +
              (lit(1.0) - col("_gf_y")) *
                log(greatest(lit(1.0) - col("_gf_p"), lit(1e-12)))))
              .as("_gf_l"))
          .persist()
        val sums = errs.agg(sum("_gf_e"), sum("_gf_l")).head()
        losses += sums.getDouble(1) / nDocs
        // bucket gradient: at most `buckets` rows after map-side combine
        val grad = feats.join(errs.select("_gf_id", "_gf_e"), Seq("_gf_id"))
          .groupBy("_gf_b").agg(sum(col("_gf_x") * col("_gf_e")).as("_gf_g"))
          .collect()
        errs.unpersist()
        grad.foreach { r =>
          val b = r.getAs[Long]("_gf_b").toInt
          val g = r.getAs[Double]("_gf_g") / nDocs + l2 * w(b)
          g2(b) += g * g
          w(b) -= lr * g / (math.sqrt(g2(b)) + eps)
        }
        val bg = sums.getDouble(0) / nDocs
        biasG2 += bg * bg
        bias -= lr * bg / (math.sqrt(biasG2) + eps)
        it += 1
      }
    } finally feats.unpersist()

    (HashedLinearModel(buckets, bias, w), losses.result())
  }

  /** Area under the ROC curve by the rank-sum (Mann–Whitney) identity,
    * with average ranks over tied scores. Evaluation-scale helper: the
    * un-partitioned ordering window funnels through one task — use it on
    * eval splits, not corpora. */
  def auc(scored: DataFrame, labelCol: String, scoreCol: String): Double = {
    val ranked = scored
      .select(col(labelCol).cast("double").as("_gf_y"),
        col(scoreCol).cast("double").as("_gf_s"))
      .withColumn("_gf_r",
        row_number().over(Window.orderBy("_gf_s")).cast("double"))
      .withColumn("_gf_ar", avg("_gf_r").over(Window.partitionBy("_gf_s")))
    val r = ranked.agg(
      sum(when(col("_gf_y") === 1.0, col("_gf_ar"))).as("posRanks"),
      sum("_gf_y").as("nPos"), count(lit(1)).cast("double").as("n")).head()
    val nPos = r.getAs[Double]("nPos")
    val nNeg = r.getAs[Double]("n") - nPos
    require(nPos > 0 && nNeg > 0, "AUC needs both classes present")
    (r.getAs[Double]("posRanks") - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
  }
}
