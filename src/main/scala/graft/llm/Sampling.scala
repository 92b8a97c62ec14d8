package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-mix resampling: re-weight a corpus by domain
  * (language, source, quality bucket) with per-domain rates, reproducibly.
  *
  * The keep/copy decision is pure integer arithmetic on the document id
  * (a Lehmer-style residue, engine-independent — a re-run of a 100 TB mix
  * job, on any engine, keeps exactly the same documents), so the whole
  * operator is a map-only codegen'd projection + filter: no shuffle, no RNG
  * state, no driver participation. Rates above 1 upsample by emitting
  * integer copies (floor(w), plus one more when the residue falls under the
  * fractional part) — the standard epoch-mixing shape for training data.
  */
object Sampling {

  /** Uniform-ish residue in [0, 65536) derived from the id and seed. The
    * multiplier is the classic MINSTD constant; ids and seed stay far from
    * Long overflow for any realistic id space. */
  def mixResidue(id: Column, seed: Long): Column =
    pmod(id * lit(48271L) + lit(seed), lit(65536L))

  /** Copies of each row under `weight` (any non-negative rate): floor(w)
    * guaranteed copies, plus one with probability frac(w) decided by the
    * residue. */
  def copiesFor(id: Column, weight: Column, seed: Long): Column = {
    val whole = floor(weight).cast("int")
    val fracThreshold = ((weight - floor(weight)) * lit(65536.0))
    (whole + when(mixResidue(id, seed) < fracThreshold, 1).otherwise(0))
      .cast("int")
  }

  /** Resample `df` with per-domain rates: each row appears `copies` times,
    * tagged with a 0-based `copy` ordinal. Domains absent from `weights`
    * get `defaultWeight`. One map-side projection + generator — no shuffle. */
  def sampleByDomain(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "sampling weights must be non-negative")
    val rate = weights.foldLeft(lit(defaultWeight)) { case (acc, (domain, w)) =>
      when(col(domainCol) === domain, lit(w)).otherwise(acc)
    }
    val withCopies = df.withColumn("__copies",
      copiesFor(col(idCol), rate, seed))
    withCopies.filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Temperature-scaled mixture weights (the Gopher/PaLM mixing rule):
    * target domain share ∝ `p_d^(1/T)` where `p_d` is the observed share —
    * `T = 1` keeps natural proportions, `T > 1` flattens toward uniform
    * (up-weights rare domains), `T → ∞` is fully uniform. Returns the
    * per-domain RATE (target share / actual share, each clamped at
    * `maxRate`) to feed [[sampleByDomain]]. One count
    * aggregation over the corpus (domains are few — the map collapses
    * map-side); everything else stays the map-only residue sampler. */
  def temperatureWeights(df: DataFrame, domainCol: String, temperature: Double,
      maxRate: Double = 4.0): Map[String, Double] = {
    require(temperature > 0, "temperature must be positive")
    require(maxRate > 0, "maxRate must be positive")
    // null domains count under their own sentinel key: folding them into
    // "" would merge them with a genuine empty-string domain AND leave the
    // null rows unmatched by sampleByDomain's equality predicate
    val counts: Map[String, Long] = df
      .groupBy(coalesce(col(domainCol).cast("string"), lit(NullDomainKey))
        .as("_gf_dom"))
      .count().collect().iterator
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    if (total == 0) return Map.empty
    val scaled = counts.view.mapValues(n =>
      math.pow(n / total, 1.0 / temperature)).toMap
    val z = scaled.values.sum
    val rates = counts.map { case (d, n) =>
      d -> (scaled(d) / z) / (n / total) // target share over actual share
    }
    // CLAMP the over-weighted domains only: unbounded up-rates repeat a
    // tiny domain into memorization, but rescaling EVERYTHING by the worst
    // offender would collapse the whole mix toward zero rows whenever one
    // extremely rare domain exists. A clamped domain lands below its ideal
    // temperature share; every other domain keeps its exact rate.
    rates.view.mapValues(r => math.min(r, maxRate)).toMap
  }

  /** The sentinel [[temperatureWeights]] uses for a NULL domain value
    * (a NUL-prefixed name no real domain string starts with). */
  val NullDomainKey = "\u0000null"

  /** [[sampleByDomain]] with [[temperatureWeights]] derived from the corpus
    * itself: one counts pass, then the map-only deterministic resample.
    * Null domains form their own mixture component (they are corpus mass
    * like any other). */
  def sampleByTemperature(df: DataFrame, idCol: String, domainCol: String,
      temperature: Double, maxRate: Double = 4.0, seed: Long = 0L): DataFrame = {
    val norm = "_gf_domain_norm"
    sampleByDomain(
        df.withColumn(norm,
          coalesce(col(domainCol).cast("string"), lit(NullDomainKey))),
        idCol, norm,
        temperatureWeights(df, domainCol, temperature, maxRate),
        defaultWeight = 0.0, seed = seed)
      .drop(norm)
  }

  /** Engine-independent hashed feature bucket for a token column: the
    * 32-bit md5 variate of the token string, mod `buckets` (same
    * cryptographic-hex discipline as [[shuffleKey]] — a DuckDB or Python
    * re-run buckets identically). */
  def tokenBucket(token: Column, buckets: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % buckets

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public knowledge):
    * rate each corpus document by how target-like its hashed-unigram
    * distribution is. Per bucket `b`, the smoothed log-ratio
    * `ln((t_b+α)/(T+αB)) − ln((r_b+α)/(R+αB))` (target vs corpus token
    * frequencies); a document scores the MEAN of its token occurrences'
    * ratios — per-token normalization, because the raw DSIR sum makes
    * every LONG document look untarget-like (each smoothed ratio carries
    * the negative corpus-entropy term, so sums scale with length).
    * Returns the corpus plus an `importance` column (rounded to
    * 4 decimals so downstream ranking reproduces across engines' libm).
    *
    * Scale shape: two token-count aggregations (corpus-sized but
    * map-side-combining into `buckets` rows) + two scalar totals; the
    * per-document score is one explode over a BROADCAST ratio table with
    * per-doc partial aggregation — no corpus-sized shuffle beyond the
    * doc-keyed score sum. */
  def importanceScores(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 4096,
      alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(alpha > 0, "alpha smoothing must be positive")
    def tokenBuckets(df: DataFrame, c: String): DataFrame = df
      .select(explode(TextOps.tokens(col(c))).as("_gf_t"))
      .filter(col("_gf_t") =!= "")
      .select(tokenBucket(col("_gf_t"), buckets).as("_gf_b"))
    val rawCounts = tokenBuckets(corpus, textCol)
      .groupBy("_gf_b").agg(count(lit(1)).as("_gf_rc"))
    val tgtCounts = tokenBuckets(target, targetTextCol)
      .groupBy("_gf_b").agg(count(lit(1)).as("_gf_tc"))
    // both totals coalesce-guarded: sum() over zero rows is null (a corpus
    // or target with no non-empty tokens), and the degenerate zero-token
    // corpus short-circuits to importance 0.0 below
    val totals =
      rawCounts.agg(coalesce(sum("_gf_rc"), lit(0L))).head().getLong(0).toDouble ->
      tgtCounts.agg(coalesce(sum("_gf_tc"), lit(0L))).head().getLong(0).toDouble
    val (rawTotal, tgtTotal) = totals
    if (rawTotal == 0.0) return corpus.withColumn("importance", lit(0.0))
    // corpus-side buckets drive the join (every doc token's bucket appears
    // in the corpus counts by construction); absent target buckets smooth
    val ratios = rawCounts.join(tgtCounts, Seq("_gf_b"), "left")
      .select(col("_gf_b"),
        (log((coalesce(col("_gf_tc"), lit(0L)) + alpha) /
            lit(tgtTotal + alpha * buckets)) -
          log((col("_gf_rc") + alpha) / lit(rawTotal + alpha * buckets)))
          .as("_gf_lr"))
    val scored = corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("_gf_t"))
      .filter(col("_gf_t") =!= "")
      .select(col(idCol), tokenBucket(col("_gf_t"), buckets).as("_gf_b"))
      .join(broadcast(ratios), Seq("_gf_b"))
      .groupBy(idCol).agg(round(avg("_gf_lr"), 4).as("importance"))
    corpus.join(scored, Seq(idCol), "left")
      .withColumn("importance", coalesce(col("importance"), lit(0.0)))
  }

  /** Deterministic importance SELECTION: the top `k` corpus documents by
    * [[importanceScores]], ties on the rounded score broken by id — the
    * greedy variant of DSIR's resampling (set `gumbelTemperature > 0` for
    * the randomized variant: score + T·Gumbel(md5 variate), still fully
    * deterministic and engine-reproducible). One bounded top-k, no full
    * sort crosses the wire. */
  def selectByImportance(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 4096, alpha: Double = 1.0,
      gumbelTemperature: Double = 0.0, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = importanceScores(corpus, idCol, textCol, target,
      targetTextCol, buckets, alpha)
    val key =
      if (gumbelTemperature == 0.0) col("importance")
      else {
        val u = (shuffleBits(col(idCol), seed).cast("double") + 0.5) /
          lit(4294967296.0)
        round(col("importance") - lit(gumbelTemperature) * log(-log(u)), 4)
      }
    scored.withColumn("selection_key", key)
      .orderBy(desc("selection_key"), col(idCol))
      .limit(k)
  }

  /** Topic-balanced mixture over an embedding column (the SemDeDup-era
    * cluster-balancing step): k-means-fit `nLists` centroids
    * ([[Similarity.ivfFit]] — one scan per iteration), assign every row
    * its nearest cluster with the codegen'd [[Similarity.nearestList]]
    * expression, then temperature-resample with the cluster id as the
    * mixture domain — `T > 1` up-weights rare topics exactly as
    * [[sampleByTemperature]] does for metadata domains. The result keeps
    * a `cluster` column so the caller can audit the rebalance. Everything
    * after the fit is the map-only residue sampler plus one small counts
    * pass; no corpus-sized shuffle. */
  def sampleByCluster(df: DataFrame, idCol: String, vecCol: String,
      nLists: Int, temperature: Double, maxRate: Double = 4.0,
      seed: Long = 0L, fitIters: Int = 2): DataFrame = {
    val cents = Similarity.ivfFit(df, idCol, vecCol, nLists, fitIters)
    val clustered = df.withColumn("cluster",
      Similarity.nearestList(col(vecCol), cents))
    sampleByTemperature(clustered, idCol, "cluster", temperature, maxRate, seed)
  }

  /** Engine-independent shuffle key: the md5 of `id:seed`. A cryptographic
    * hex string rather than a cheap integer hash so the SAME permutation is
    * reproducible bit-for-bit on any engine (Spark, DuckDB, a Python
    * loader) — global training order is part of a run's provenance. */
  def shuffleKey(id: Column, seed: Long): Column =
    md5(concat(id.cast("string"), lit(":" + seed)))

  /** The top 32 bits of the shuffle key as a non-negative long in
    * [0, 2^32): the uniform variate behind sharding and splits. */
  def shuffleBits(id: Column, seed: Long): Column =
    conv(substring(shuffleKey(id, seed), 1, 8), 16, 10).cast("long")

  /** Deterministic global shuffle into `numShards` training shards: every
    * row gets a `shard` and an in-shard `sort_key`, then rows are
    * exchanged once by shard and sorted within partitions — at 100 TB this
    * is THE way to shuffle (a global random sort is one range exchange;
    * per-shard locality lets `partitionBy(shard)` writers emit
    * sequentially-readable shard files). No RNG state: re-running the job
    * anywhere reproduces the identical order. */
  def shuffleIntoShards(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("sort_key", shuffleKey(col(idCol), seed))
      .withColumn("shard",
        (shuffleBits(col(idCol), seed) % numShards).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))
  }

  /** Deterministic per-domain token-budget admission — the "assemble an
    * N-token training mix" primitive: within each domain, documents are
    * admitted in the engine-independent shuffle order ([[shuffleBits]],
    * ties broken by id) until the domain's token budget is exhausted
    * (a document is kept iff its INCLUSIVE running token sum ≤
    * `budgetTokens`). Admitted rows come back with their `cum_tokens`, so
    * the caller can audit exactly where each domain's budget landed.
    * `tokensCol` must be non-negative (token counts are).
    *
    * Scale shape — a two-phase prefix sum, NOT a per-domain window. A
    * window partitioned by domain sorts each domain in ONE task, so a
    * dominant domain (half of a 100 TB corpus behind one key) becomes a
    * single straggler sort. Instead the 32-bit variate is cut into
    * `rangeBuckets` equal ranges:
    *
    *   1. per-(domain, bucket) token sums — one map-side-combining
    *      aggregation whose result is tiny (domains × buckets rows);
    *   2. exclusive bucket offsets via a running sum over that TINY table;
    *   3. offsets already past the budget are dropped, and the offset
    *      table inner-joins back (broadcast) — whole buckets beyond the
    *      budget never reach the expensive phase, so with budget ≪ corpus
    *      most of the data is filtered BEFORE it shuffles;
    *   4. the full-width running sum is offset + a window within
    *      (domain, bucket), whose partitions hold ~n_domain/rangeBuckets
    *      rows regardless of how skewed the domain distribution is.
    *
    * Bit-for-bit reproducible on any engine (the variate is an md5
    * prefix); the DuckDB oracle is the single-window equivalent.
    *
    * The offsets table is (distinct domains × `rangeBuckets`) rows before
    * the budget filter prunes it. With the usual handful-of-sources domain
    * column that is tiny and the forced broadcast is right; with a
    * HIGH-CARDINALITY domain (per-URL domains on a web corpus) pass
    * `broadcastOffsets = false` so the join strategy is AQE's
    * runtime-size decision instead of an unconditional driver broadcast. */
  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: Column, budgetTokens: Long, seed: Long = 0L,
      rangeBuckets: Int = 1024, broadcastOffsets: Boolean = true): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    tokenBudgetMixImpl(df, idCol, domainCol, tokensCol, _ => lit(budgetTokens),
      seed, rangeBuckets, broadcastOffsets)
  }

  /** [[tokenBudgetMix]] with PER-DOMAIN budgets — the shape real mixes
    * use ("30B tokens of code, 10B of wiki, 2B default for the rest"):
    * `budgets` maps domain values to their token budgets and
    * `defaultBudget` prices every unlisted (or null) domain. Admission,
    * determinism, and the two-phase prefix sum are identical to the
    * uniform-budget form; only the threshold each row is compared against
    * becomes a per-domain lookup. */
  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: Column, budgets: Map[String, Long], defaultBudget: Long,
      seed: Long, rangeBuckets: Int, broadcastOffsets: Boolean): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0L),
      "token budgets must be non-negative")
    val budgetOf: Column => Column =
      if (budgets.isEmpty) _ => lit(defaultBudget)
      else d => coalesce(
        element_at(typedLit(budgets), d.cast("string")), lit(defaultBudget))
    tokenBudgetMixImpl(df, idCol, domainCol, tokensCol, budgetOf,
      seed, rangeBuckets, broadcastOffsets)
  }

  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: Column, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame =
    tokenBudgetMix(df, idCol, domainCol, tokensCol, budgets, defaultBudget,
      seed = 0L, rangeBuckets = 1024, broadcastOffsets = true)

  private def tokenBudgetMixImpl(df: DataFrame, idCol: String,
      domainCol: String, tokensCol: Column, budgetOf: Column => Column,
      seed: Long, rangeBuckets: Int, broadcastOffsets: Boolean): DataFrame = {
    require(rangeBuckets > 0 && (rangeBuckets & (rangeBuckets - 1)) == 0 &&
      rangeBuckets <= (1 << 20),
      "rangeBuckets must be a power of two in [1, 2^20]")
    val shift = 32 - Integer.numberOfTrailingZeros(rangeBuckets)
    val base = df
      .withColumn("__gf_v", shuffleBits(col(idCol), seed))
      .withColumn("__gf_b", shiftright(col("__gf_v"), shift).cast("int"))
      .withColumn("__gf_t", tokensCol.cast("long"))
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("__gf_d").orderBy("__gf_pb")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets0 = base
      .groupBy(col(domainCol).as("__gf_d"), col("__gf_b").as("__gf_pb"))
      .agg(sum("__gf_t").as("__gf_bt"))
      .withColumn("__gf_off", coalesce(sum("__gf_bt").over(byBucket), lit(0L)))
      // a bucket whose exclusive offset already exceeds its domain's budget
      // cannot contain an admitted row (tokens are non-negative, so every
      // inclusive sum in it is ≥ the offset) — dropping it here turns the
      // inner join below into a data-pruning filter
      .filter(col("__gf_off") <= budgetOf(col("__gf_d")))
      .select("__gf_d", "__gf_pb", "__gf_off")
    val offsets = if (broadcastOffsets) broadcast(offsets0) else offsets0
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol), col("__gf_b"))
      .orderBy(col("__gf_v"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base
      .join(offsets,
        col(domainCol) <=> col("__gf_d") && col("__gf_b") === col("__gf_pb"))
      .withColumn("cum_tokens", col("__gf_off") + sum("__gf_t").over(inBucket))
      .filter(col("cum_tokens") <= budgetOf(col(domainCol)))
      .drop("__gf_v", "__gf_b", "__gf_t", "__gf_d", "__gf_pb", "__gf_off")
  }

  /** Deterministic train/val/test assignment: integer thresholds on the
    * 32-bit shuffle variate (no float-boundary ambiguity), map-only.
    * `fractions` are (name, weight) in assignment order; weights are
    * normalized, so (train→0.9, val→0.05, test→0.05) and (18, 1, 1) agree. */
  def assignSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      fractions.map(_._2).sum > 0, "split fractions must be non-negative, sum > 0")
    val total = fractions.map(_._2).sum
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(c => math.min((c * 4294967296.0).toLong, 4294967296L))
    val v = shuffleBits(col(idCol), seed)
    val split = fractions.zip(bounds).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), hi)) =>
        when(v < hi, name).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** [[assignSplit]] with the leakage guard: near-dup CLUSTERS stay whole.
    * Every document draws its split from its connected-component id (the
    * minimum doc id of its near-dup cluster; singletons are their own
    * component), not from its own id — per-doc hashing puts ~2·f·(1−f) of
    * every cluster's pairs across the train/eval boundary, and a
    * near-duplicate of an eval document inside the training set is
    * memorization reported as generalization. `pairs` is any near-dup
    * pair frame ([[Dedup.minHashLshPairs]], [[Dedup.ngramJaccardPairs]],
    * [[Dedup.simHashPairs]], embedding pairs). Output adds `component`
    * and `split`. Scale shape: the CC rounds of [[Dedup.componentIds]]
    * plus one hash — no extra exchange beyond them. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)], seed: Long = 0L): DataFrame =
    assignSplit(Dedup.componentIds(df, idCol, pairs), "component",
      fractions, seed)
}
