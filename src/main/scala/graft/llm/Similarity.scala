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

  /** Planes so each bucket holds ≈ `targetBucketSize` vectors: probe cost is
    * bounded by bucket size, not corpus size — at 10B vectors (100 TB of
    * embeddings) this yields ~14 planes / 16k buckets, so a radius-2
    * multiprobe of ~106 buckets scans ~0.7% of the corpus per query batch. */
  def planesFor(corpusSize: Long, targetBucketSize: Long = 1L << 20): Int =
    math.max(3, math.ceil(math.log(
      math.max(1.0, corpusSize.toDouble / targetBucketSize)) / math.log(2.0)).toInt)

  /** Approximate top-k: `numTables` independent sign-bit hash tables; per
    * table, candidates come from the query's bucket plus every bucket within
    * Hamming distance `probeRadius` (combinatorial multiprobe), then exact
    * cosine + window over the union. Independent tables drive the miss
    * probability down multiplicatively (p_miss^L) where a single table
    * plateaus. The join is an equi-join on (table, bucket) — candidate cost
    * per query is `numTables × probes × bucketSize`, bounded by
    * [[planesFor]]'s bucket sizing, not corpus size. `numPlanes` < 0 derives
    * the plane count from the corpus size. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, numPlanes: Int = -1, dim: Int = 64,
      probeRadius: Int = 2, numTables: Int = 2): DataFrame = {
    val nPlanes = if (numPlanes > 0) numPlanes else planesFor(corpus.count())
    val tables = (0 until numTables)
      .map(t => hyperplanes(nPlanes, dim, seed = 42L + 7919L * t))
    // corpus indexed once per table: (table, bucket) rows
    val corpusBuckets = array(tables.zipWithIndex.map { case (pl, t) =>
      struct(lit(t).as("t"), bucketOf(col(vecCol), pl).as("b"))
    }: _*)
    val bucketed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      explode(corpusBuckets).as("tb"))
    // XOR masks of Hamming weight ≤ probeRadius (generated combinatorially —
    // never enumerating the 2^planes bucket space)
    val masks: Seq[Int] = {
      def combos(weight: Int): Seq[Int] =
        if (weight == 0) Seq(0)
        else (0 until nPlanes).combinations(weight).map(_.map(1 << _).sum).toSeq
      (0 to math.min(probeRadius, nPlanes)).flatMap(combos)
    }
    val queryProbes = array((for {
      (pl, t) <- tables.zipWithIndex
      m <- masks
    } yield struct(lit(t).as("t"),
      bucketOf(col(vecCol), pl).bitwiseXOR(lit(m)).as("b"))): _*)
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(queryProbes).as("tb"))
    val joined = bucketed.join(broadcast(q), Seq("tb"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
