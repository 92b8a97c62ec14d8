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

  /** Dot product of two numeric-array columns, computed in double.
    * Codegen'd ([[graft.expressions.DotProduct]]) — the interpreted HOF
    * fold this replaces ran per-element lambda frames on every candidate
    * pair of every ANN probe; LlmSpec pins the two bit-exact. */
  def dot(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.DotProduct(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
  }

  /** The interpreted HOF fold [[dot]] replaced — kept as the parity
    * oracle LlmSpec ranks the codegen'd expression against. */
  private[graft] def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a numeric-array column, computed in double (same
    * left-to-right accumulation as the fold it replaces). */
  def l2norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity of two float-array columns, computed in double.
    * The division and sqrt stay ordinary Spark operators, so ANSI
    * semantics (divide-by-zero on a zero-norm vector) are unchanged. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Per-query top-k WITHOUT a window: [[graft.expressions.BoundedTopK]]
    * partial-aggregates a k-bounded heap map-side, so the exchange carries
    * at most k rows per (query × input partition) instead of funnelling
    * EVERY candidate row of a query through one window task — at 100 TB
    * candidate volumes that single sorted task is the job's straggler.
    * Input columns: `query_id`, `neighbor_id`, `sim` (pre-rounded).
    * Output `(query_id, rank, neighbor_id, sim)`, ranked sim DESC then
    * neighbor_id ASC — the exact window `row_number` order it replaces. */
  def topKPerQuery(cands: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val agg = ColumnBridge.column(
      graft.expressions.BoundedTopK(k,
        ColumnBridge.expression(col("sim").cast("double")),
        ColumnBridge.expression(col("neighbor_id").cast("long")))
        .toAggregateExpression())
    cands.groupBy("query_id").agg(agg.as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col("query_id"), (col("_r") + 1).cast("int").as("rank"),
        col("_e.id").as("neighbor_id"), col("_e.ord").as("sim"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009 — public
    * knowledge): fuse per-query rankings from heterogeneous retrievers
    * (BM25, ANN, …) by `score(d) = Σ_lists 1/(k0 + rank_list(d))` — rank
    * positions, never raw scores, so lexical and vector scales need no
    * calibration against each other. The standard hybrid-retrieval
    * combiner. Each input needs columns `(query_id, rank, doc_id)`;
    * output `(query_id, rank, doc_id, score)`, top `k` per query, ties on
    * the rounded fused score broken by doc_id.
    *
    * Scale shape: inputs are already top-k-bounded (k × queries rows
    * each), so the union + sum is retrieval-sized, never corpus-sized,
    * and the final ranking is the bounded [[topKPerQuery]] heap — no
    * window, no full sort. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && k0 >= 0, "bad rrf parameters")
    val scored = rankings.map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rank"))).as("_gf_rr")))
      .reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(round(sum("_gf_rr"), 6).as("sim"))
    topKPerQuery(
        scored.select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("sim")), k)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("doc_id"), col("sim").as("score"))
  }

  /** Exact top-k neighbors for each query id: one corpus scan, query side
    * broadcast, bounded top-k reduce per query. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val joined = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    topKPerQuery(joined.select("query_id", "neighbor_id", "sim"), k)
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit LSH. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of a vector under the given hyperplanes.
    * Codegen'd ([[graft.expressions.SignBits]]) — one loop instead of
    * planes × dim interpreted lambda evaluations per row. */
  def bucketOf(vecCol: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.SignBits(
      ColumnBridge.expression(vecCol), planes.map(_.toSeq).toSeq))
  }

  /** The interpreted HOF form [[bucketOf]] replaced (parity oracle). */
  private[graft] def bucketOfHof(vecCol: Column, planes: Array[Array[Double]]): Column = {
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
    * the plane count from the corpus size; pass `corpusSize` when the
    * caller already knows it (graft-table record-count metadata, a memoized
    * count) — deriving it here otherwise costs a full corpus pass PER CALL,
    * which at scale rivals the query itself. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, numPlanes: Int = -1, dim: Int = 64,
      probeRadius: Int = 2, numTables: Int = 2, corpusSize: Long = -1L): DataFrame = {
    val nPlanes = if (numPlanes > 0) numPlanes
      else planesFor(if (corpusSize >= 0) corpusSize else corpus.count())
    // small-corpus guard: with few planes the multiprobe visits most of the
    // bucket space — numTables × probedCells / 2^planes is the fraction of
    // the corpus scanned (×tables); at ≥ 1 the "approximation" costs more
    // than the exact scan it approximates, so delegate to it
    val probedCells = (0 to math.min(probeRadius, nPlanes))
      .map(w => (0 until nPlanes).combinations(w).size.toLong).sum
    if (numTables * probedCells >= (1L << nPlanes))
      return bruteForceTopK(corpus, idCol, vecCol, queryIds, k)
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
    topKPerQuery(joined.select("query_id", "neighbor_id", "sim"), k)
  }

  // ------------------------------------------------------------------ IVF

  /** Per-centroid `[cosine, index]` pairs (arrays order lexicographically,
    * so array_max/array_sort rank by similarity then index) — the
    * SEMANTICS ORACLE for the codegen'd centroid expressions below: higher-
    * order functions evaluate interpreted (never codegen), so this form
    * costs k×dim interpreted multiply-adds per row; production assignment
    * runs [[graft.expressions.NearestCentroid]] instead, and LlmSpec pins
    * the two bit-exactly equal (incl. ties, NaN from zero vectors). */
  private[graft] def listSims(vecCol: Column, cents: Seq[Seq[Double]]): Column =
    transform(typedLit(cents), (cv, i) =>
      array(cosine(vecCol, cv), i.cast("double")))

  /** [[listSims]]-shaped nearest pick as interpreted HOFs (parity oracle). */
  private[graft] def nearestListHof(vecCol: Column, cents: Seq[Seq[Double]]): Column =
    element_at(array_max(listSims(vecCol, cents)), 2).cast("int")

  /** [[listSims]]-shaped top-m pick as interpreted HOFs (parity oracle). */
  private[graft] def nearestListsHof(vecCol: Column, cents: Seq[Seq[Double]],
      m: Int): Column =
    transform(slice(array_sort(listSims(vecCol, cents)), -m, m),
      e => element_at(e, 2).cast("int"))

  /** Index of the nearest (max-cosine) centroid; ties break to the larger
    * index — any deterministic rule works, rows near a tie belong to either
    * list equally well. Codegen'd ([[graft.expressions.NearestCentroid]]):
    * the interpreted HOF form was the most expensive expression in the
    * engine at k×dim lambda evaluations per corpus row. */
  def nearestList(vecCol: Column, cents: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NearestCentroid(
      ColumnBridge.expression(vecCol), cents))
  }

  /** Indices of the `m` nearest centroids, nearest last (same
    * [cosine, index] lexicographic rule as [[nearestList]] — multiprobe
    * assignment for boundary-straddling vectors). Codegen'd. */
  def nearestLists(vecCol: Column, cents: Seq[Seq[Double]], m: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NearestCentroids(
      ColumnBridge.expression(vecCol), cents, m))
  }

  /** Lists sized so probe cost is bounded by list size, not corpus size
    * (same contract as [[planesFor]]); capped at 16k lists — beyond that an
    * IVF index goes hierarchical (a second quantizer level), not wider. */
  def listsFor(corpusSize: Long, targetListSize: Long = 1L << 20): Int =
    math.max(2, math.min(1 << 14,
      math.ceil(corpusSize.toDouble / math.max(1L, targetListSize)).toInt))

  /** Element-wise sum of an `array<double>` column as an aggregate —
    * [[graft.expressions.ArraySum]] keeps one running `double[dim]` per
    * group per partition, so the exchange carries k×dim partials instead of
    * N×dim exploded scalars. */
  private def arraySumAgg(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.expressions.ArraySum(ColumnBridge.expression(c))
        .toAggregateExpression())
  }

  /** Deterministic k-means (Lloyd) coarse quantizer trained as DataFrame
    * jobs: init = the `nLists` lowest-id vectors, then `iters` rounds of
    * assign + per-list element-wise mean in ONE aggregation — grouping key =
    * nearest centroid (evaluated once per ROW), aggregate = running
    * `double[dim]` sums ([[graft.expressions.ArraySum]]) + a count, so each
    * round is one corpus scan whose exchange carries k×dim partials per
    * partition. Only k×dim doubles ever reach the driver.
    *
    * The obvious posexplode→groupBy(list, pos) spelling is a trap: Catalyst
    * collapses the computed `list` alias into the post-Generate projection,
    * re-evaluating the interpreted nearest-centroid transform once per array
    * ELEMENT (dim× amplification of the job's most expensive expression —
    * measured 335 s to fit 8 centroids over 20k×64 vectors; the ArraySum
    * form fits 200k×64 in seconds).
    *
    * At 100 TB train on `corpus.sample(...)`: quantizer quality needs
    * ~100× nLists vectors, not the full corpus. */
  def ivfFit(corpus: DataFrame, idCol: String, vecCol: String, nLists: Int,
      iters: Int = 2): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[Seq[Double]] = corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(vecCol).cast("array<double>")).as[Seq[Double]].collect().toSeq
    (1 to iters).foreach { _ =>
      val means = corpus
        .select(nearestList(col(vecCol), cents).as("list"),
          col(vecCol).cast("array<double>").as("v"))
        .groupBy("list")
        .agg(arraySumAgg(col("v")).as("s"), count(lit(1)).as("n"))
        .as[(Int, Seq[Double], Long)].collect()
        .map { case (l, s, n) => l -> s.map(_ / n) }.toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: corpus partitioned into
    * `nLists` inverted lists by nearest centroid; each query probes its
    * `nProbe` nearest lists, so candidate cost per query is
    * `nProbe/nLists` of the corpus (vs the LSH tables' bucket union). The
    * probe is an equi-join on the list id with the query side broadcast —
    * at 1000 executors each probe list streams through its own tasks, no
    * cross join. `nProbe >= nLists` degenerates to exact brute force (the
    * LlmSpec exactness pin). `nLists < 0` derives the list count from the
    * corpus size.
    *
    * ONE-SHOT form: fits the quantizer and assigns every row per call
    * (~5 corpus passes before the probe). For repeated queries build a
    * [[IvfIndex]] once — its `topK` is probe-only against the persisted,
    * list-partitioned index table. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nLists: Int = -1, nProbe: Int = 2,
      iters: Int = 2): DataFrame = {
    val n = if (nLists > 0) nLists else listsFor(corpus.count())
    val cents = ivfFit(corpus, idCol, vecCol, n, iters)
    // a corpus smaller than nLists yields fewer centroids; clamp the probe
    // count to what exists (slice past the array length returns EMPTY)
    val probes = math.min(math.max(1, nProbe), cents.size)
    val indexed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      nearestList(col(vecCol), cents).as("list"))
    // top-nProbe lists per query: the m nearest centroids, nearest last
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(nearestLists(col(vecCol), cents, probes)).as("list"))
    // each corpus row lives in exactly ONE list and a query's probed lists
    // are distinct, so no candidate is seen twice — no dropDuplicates
    val joined = indexed.join(broadcast(q), Seq("list"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
    topKPerQuery(joined.select("query_id", "neighbor_id", "sim"), k)
  }

  // ------------------------------------------------- product quantization

  /** One subspace slice of a vector's residual against its coarse
    * centroid (codegen'd [[graft.expressions.ResidualSlice]]). */
  private[llm] def residualSlice(vec: Column, list: Column,
      cents: Seq[Seq[Double]], from: Int, len: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.ResidualSlice(
      ColumnBridge.expression(vec), ColumnBridge.expression(list),
      cents, from, len))
  }

  /** Index of the L2-nearest codeword (ties → larger index; the PQ
    * assignment rule — see [[graft.expressions.PqKernel]]). */
  private[llm] def nearestL2(c: Column, book: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NearestCentroidL2(
      ColumnBridge.expression(c), book))
  }

  /** M-byte PQ code of a vector given its coarse list assignment
    * (codegen'd [[graft.expressions.PqEncode]]). */
  def pqEncode(vec: Column, list: Column, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.PqEncode(
      ColumnBridge.expression(vec), ColumnBridge.expression(list),
      cents, books))
  }

  /** ADC score: `Σ_m lut[m*ks + code_m]` ≈ dot(query, residual)
    * (codegen'd [[graft.expressions.PqAdc]]). */
  def pqAdc(codes: Column, lut: Column, ks: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.PqAdc(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut), ks))
  }

  /** Query-side ADC lookup table, computed per ROW (codegen'd
    * [[graft.expressions.PqLut]]) — the distributed-query twin of the
    * probe API's driver-computed LUT. */
  def pqLut(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.PqLut(
      ColumnBridge.expression(vec), books))
  }

  /** Train the M per-subspace PQ codebooks (Jégou et al. 2011) over the
    * corpus rows' RESIDUALS against their coarse centroids: deterministic
    * L2 Lloyd per subspace — init = the `ks` lowest-id rows' residual
    * slices, then `iters` rounds of assign (codegen'd L2 nearest) +
    * per-codeword element-wise mean in ONE aggregation per subspace (the
    * [[graft.expressions.ArraySum]] shape of [[ivfFit]]; the mean IS the
    * L2-optimal Lloyd update). `df` must carry `idCol`, `vecCol`, and the
    * coarse assignment in `listCol`. Returns m × ks' × (dim/m) codebooks
    * (ks' < ks when the corpus has fewer rows — every subspace gets the
    * same ks', keeping the probe-side LUT layout rectangular).
    *
    * Cost: the sliced-residuals frame is persisted once; each subspace
    * then runs `iters` cache-backed aggregation jobs. At 100 TB train on
    * `df.sample(...)` exactly like the coarse quantizer — codebook
    * quality needs ~100× ks vectors per subspace, not the corpus. */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, listCol: String,
      cents: Seq[Seq[Double]], m: Int, ks: Int,
      iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val dim = cents.head.length
    require(m >= 1 && dim % m == 0,
      s"PQ subspace count $m must divide the vector dimension $dim")
    require(ks >= 1 && ks <= 256, s"PQ codebook size $ks out of range 1..256")
    val sub = dim / m
    val spark = df.sparkSession
    import spark.implicits._
    val subCols = (0 until m).map(i => s"_gf_s$i")
    val slices = df.select(col(idCol) +:
      (0 until m).map(i => residualSlice(col(vecCol), col(listCol),
        cents, i * sub, sub).as(subCols(i))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // all m inits in one collect: the ks lowest-id rows' slices
      val initRows = slices.orderBy(col(idCol)).limit(ks)
        .select(subCols.map(col): _*).collect()
      var books: IndexedSeq[Seq[Seq[Double]]] = (0 until m).map(i =>
        initRows.toSeq.map(_.getSeq[Double](i)))
      (1 to iters).foreach { _ =>
        books = (0 until m).map { i =>
          val book = books(i)
          val means = slices
            .select(nearestL2(col(subCols(i)), book).as("c"),
              col(subCols(i)).as("v"))
            .groupBy("c")
            .agg(arraySumAgg(col("v")).as("s"), count(lit(1)).as("n"))
            .as[(Int, Seq[Double], Long)].collect()
            .map { case (c, s, n) => c -> s.map(_ / n) }.toMap
          book.indices.map(c => means.getOrElse(c, book(c)))
        }
      }
      books.map(_.toSeq)
    } finally slices.unpersist()
  }

  // ------------------------------------------------- int8 quantization

  /** Symmetric per-vector int8 quantization: `codes` in [-127, 127] plus a
    * non-negative `qscale` (max |component| / 127). Persist the result as
    * the search corpus — codes are 4× smaller than float32, so the
    * candidate-ranking scan moves 4× fewer bytes at any corpus size.
    * Cosine over codes equals cosine over `qscale`-rescaled floats (the
    * scale cancels), so ranking quality degrades only by rounding. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = greatest(
      aggregate(col(vecCol), lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
        / 127.0,
      lit(java.lang.Double.MIN_NORMAL)) // all-zero vector: any scale works
    // scale is LET-BOUND into the codes lambda (TextOps.bound): referenced
    // bare it would re-run the max-|x| fold once per array ELEMENT —
    // dim× the most expensive part of the quantization (the same Catalyst
    // lambda-inlining trap as ivfFit's posexplode fit)
    df.select(col(idCol), col(vecCol),
      TextOps.bound(scale)(s =>
        transform(col(vecCol), x => round(x.cast("double") / s).cast("tinyint")))
        .as("codes"),
      scale.as("qscale"))
  }

  /** ONE-SHOT quantized top-k with exact rescore — DEMOTED to a reference
    * implementation: it re-quantizes the whole corpus per call and windows
    * per query, so the production path is [[IvfIndex.topKQuantized]]
    * (codes persisted once at build time, k-bounded heap aggregation, probe
    * scans pruned to the probed lists). Kept as the semantics oracle the
    * LlmSpec parity test ranks the persisted path against.
    *
    * Rank ALL candidates by int8-code cosine, keep `k × rescoreFactor` per
    * query, then re-rank only those survivors with exact float cosine. */
  def quantizedTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, rescoreFactor: Int = 4): DataFrame = {
    val quant = quantizeInt8(corpus, idCol, vecCol)
    val q = quant.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("codes").as("qcodes"))
    val approx = quant
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("codes"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("asim", cosine(col("qcodes"), col("codes")))
    val wa = Window.partitionBy("query_id").orderBy(desc("asim"), asc("neighbor_id"))
    approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= k * rescoreFactor)
      .withColumn("sim", round(cosine(col("qv"), col("nv")), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
