package graft.table

import graft.meta.Schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate tables (materialized views) over a
  * graft source table, refreshed from the row-level CHANGELOG (NEW — the
  * reference era exposes the incremental-read lineage this builds on,
  * `core/.../IncrementalDataTableScan.java`, but no view maintenance).
  *
  * The maintenance strategy is recompute-affected-groups: a refresh reads
  * the changelog of `(recorded, current]`, takes the DISTINCT group keys
  * it touched, recomputes the aggregate for exactly those groups, and
  * applies the result as one MERGE (update changed groups, insert new
  * ones, delete groups whose last source row vanished). Recomputing the
  * group — rather than algebraically patching it — is what makes EVERY
  * aggregate expression legal (min/max/avg/count_distinct are not
  * delta-invertible under deletes); the delta-bound still holds because
  * work scales with CHANGED groups, not table size. The classic
  * restriction to "only sum/count views maintain incrementally" becomes a
  * future optimization here, not a correctness constraint.
  *
  * Scale shape: the changelog walk is lineage-bounded (see [[Changelog]]);
  * the affected-keys frame is |changed groups|-sized; the recompute scan
  * is a semi-join against it — when the view keys align with the source's
  * partition spec (the common case: daily rollups over a days-partitioned
  * table) partition pruning bounds that scan too, otherwise it is one
  * full-scan-with-early-filter, still cheaper than the full re-aggregate
  * whenever changed groups ≪ all groups. The MERGE rewrites only the data
  * files holding changed groups (dynamic file filter).
  *
  * Crash-window semantics: the MERGE and the watermark advance are two
  * commits, but a rerun after a crash between them CONVERGES — the
  * replayed refresh recomputes the same groups to the same values (MERGE
  * upserts are idempotent) and its final property commit closes the
  * window. Asserted by the spec's rerun case.
  */
object IncrementalView {

  val SourceLocProp = "mv.source-location"
  val SourceSnapProp = "mv.source-snapshot-id"
  val KeysProp = "mv.group-keys"
  val AggsProp = "mv.aggregates"
  // aggregates may contain commas — separate with a char no SQL uses
  private val AggSep = "\u0001"
  private val OpCol = "_gf_mv_op"

  final case class RefreshResult(view: IceTable, upsertedGroups: Long,
      deletedGroups: Long, rebuilt: Boolean)

  private def aggregate(src: DataFrame, keys: Seq[String],
      aggs: Seq[String]): DataFrame = {
    val exprs = aggs.map(expr)
    src.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Create the view table at `location`: the aggregate of `source`'s
    * CURRENT snapshot, with the defining query (keys + aggregate SQL
    * expressions) and the source watermark stamped as table properties so
    * [[refresh]] is self-describing. Each aggregate must carry an explicit
    * alias (`"sum(v) AS total"`) — the MERGE needs stable column names. */
  def create(spark: SparkSession, source: IceTable, location: String,
      keys: Seq[String], aggs: Seq[String]): IceTable = {
    require(keys.nonEmpty, "aggregate view needs at least one group key")
    require(aggs.nonEmpty, "aggregate view needs at least one aggregate")
    val unaliased = aggs.filterNot(_.matches("(?is).*\\s+as\\s+\\w+\\s*"))
    require(unaliased.isEmpty,
      s"aggregates need explicit aliases (… AS name): ${unaliased.mkString("; ")}")
    require(!aggs.exists(_.contains(AggSep)), "aggregate contains the U+0001 separator")
    val snap = source.meta.currentSnapshotId.getOrElse(throw new IllegalArgumentException(
      s"Source at ${source.location} has no snapshot yet — append first, " +
        "then create the view (the watermark needs a real snapshot id)"))
    val df = aggregate(source.toDF, keys, aggs)
    val view = IceTable.create(spark, location, Schema.fresh(df.schema),
      properties = Map(
        SourceLocProp -> source.location,
        SourceSnapProp -> snap.toString,
        KeysProp -> keys.mkString(","),
        AggsProp -> aggs.mkString(AggSep)))
    view.append(df)
    view
  }

  /** Bring the view up to the source's current snapshot. Incremental
    * (changelog → affected keys → recompute → MERGE) whenever the
    * changelog can serve the range; full rebuild when it cannot (expired
    * or rolled-back watermark) or when a changed group key is NULL (the
    * MERGE key join cannot address null groups). */
  def refresh(spark: SparkSession, location: String,
      sourceOverride: Option[IceTable] = None): RefreshResult = {
    val view = IceTable.load(spark, location)
    val props = view.meta.properties
    val keys = props.getOrElse(KeysProp, throw new IllegalArgumentException(
      s"Table at $location is not an aggregate view (missing $KeysProp)"))
      .split(',').toSeq
    val aggs = props(AggsProp).split(AggSep).toSeq
    val source = sourceOverride.getOrElse(
      IceTable.load(spark, props(SourceLocProp)))
    val recorded = props(SourceSnapProp).toLong
    val current = source.meta.currentSnapshotId.getOrElse(recorded)
    if (current == recorded) return RefreshResult(view, 0L, 0L, rebuilt = false)

    def rebuild(): RefreshResult = {
      // one atomic Overwrite commit: drop everything, append the fresh
      // aggregate, advance the watermark — readers never see a half view
      view.newTransaction()
        .delete(graft.meta.expr.TrueExpr)
        .append(aggregate(source.toDF, keys, aggs))
        .updateProperties(Map(SourceSnapProp -> current.toString))
        .commit()
      RefreshResult(IceTable.load(spark, location), 0L, 0L, rebuilt = true)
    }

    val changes =
      try Changelog.changes(source, Some(recorded), Some(current))
      catch {
        case _: IllegalArgumentException => return rebuild()
        case _: ValidationException => return rebuild()
      }
    val affected = changes.select(keys.map(col): _*).distinct().persist()
    try {
      val nAffected = affected.count()
      if (nAffected == 0) {
        view.updateProperties(Map(SourceSnapProp -> current.toString))
        return RefreshResult(view, 0L, 0L, rebuilt = false)
      }
      if (affected.filter(keys.map(col(_).isNull).reduce(_ || _)).limit(1)
          .count() > 0) return rebuild()

      val recomputed = aggregate(
        source.toDF.join(affected, keys, "left_semi"), keys, aggs)
      // groups whose last row vanished: affected but absent from recompute
      val gone = affected.join(recomputed.select(keys.map(col): _*),
        keys, "left_anti")
      val viewCols = view.schema.columnNames
      val mergeSrc = recomputed.withColumn(OpCol, lit("I"))
        .unionByName(gone.select(
          (viewCols.map(c =>
            if (keys.contains(c)) col(c)
            else lit(null).cast(view.toDF.schema(c).dataType).as(c)) :+
            lit("D").as(OpCol)).toIndexedSeq: _*))
        .persist()
      val counts = mergeSrc.groupBy(OpCol).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val op = col(MergeBuilder.SourcePrefix + OpCol)
      view.merge(mergeSrc, keys)
        .whenMatchedDelete(Some(op === "D"))
        .whenMatchedUpdateAll(Some(op === "I"))
        .whenNotMatchedInsertAll(Some(op === "I"))
        .execute()
      mergeSrc.unpersist()
      view.updateProperties(Map(SourceSnapProp -> current.toString))
      RefreshResult(IceTable.load(spark, location),
        counts.getOrElse("I", 0L), counts.getOrElse("D", 0L),
        rebuilt = false)
    } finally affected.unpersist()
  }
}
