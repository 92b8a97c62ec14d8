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
}
