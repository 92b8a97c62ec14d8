package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (NEW; SURVEY §7 item
  * 10). Brute-force top-k is the exact baseline (broadcast the query side,
  * scan the corpus once); the LSH-bucketed variant is the scale path — a
  * random-hyperplane coarse quantizer turns the cross join into an equi-join
  * on buckets, multiprobed for recall.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query id: one corpus scan, query side
    * broadcast, per-query window for the top-k. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val joined = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit LSH. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of a vector under the given hyperplanes. */
  def bucketOf(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit).toIndexedSeq: _*)
      val d = aggregate(zip_with(vecCol, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket and
    * its 1-bit-flip multiprobes, then exact cosine + window. The join is an
    * equi-join on bucket — shuffle-bounded at 100 TB. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, numPlanes: Int = 3, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bucketed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      bucketOf(col(vecCol), planes).as("bucket"))
    // queries probe their own bucket + every 1-bit flip
    val probes = (0 until numPlanes).foldLeft(Seq(col("qbucket"))) { (acc, i) =>
      acc :+ col("qbucket").bitwiseXOR(lit(1 << i))
    }
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        bucketOf(col(vecCol), planes).as("qbucket"))
      .withColumn("bucket", explode(array(probes: _*)))
      .select("query_id", "qv", "bucket")
    val joined = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
