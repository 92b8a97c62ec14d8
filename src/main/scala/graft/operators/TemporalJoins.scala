package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Temporal join operators Spark lacks natively (NEW — no reference
  * counterpart; the build brief's canonical custom-operator examples),
  * implemented by COMPOSITION of built-in operators — preference (a) of
  * the custom-operator ladder — so Catalyst/AQE keep optimizing them:
  *
  *  - [[asofJoin]]: the union + keyed-window trick. Tagging both sides
  *    into one frame and running `last(_, ignoreNulls)` over a
  *    (key, time)-ordered window IS the as-of semantics, and its physical
  *    plan is ONE exchange + sort — the same cost as the sort-merge join
  *    the problem lower-bounds to. No range-condition join ever appears,
  *    so Spark's BroadcastNestedLoop trap (the naive `l.t >= r.t AND
  *    no-equi` plan, O(|L|·|R|)) is structurally impossible.
  *  - [[rangeJoin]]: interval containment by grid bucketing. Intervals
  *    explode to the fixed-width cells they cover, points map to exactly
  *    one cell, and the join becomes an EQUI-join on (keys, cell) with a
  *    residual `BETWEEN` filter — each matched pair meets in exactly one
  *    cell (the point's), so no dedup pass is needed. Cost scales with
  *    interval-length/width, guarded by an explicit cells cap.
  *
  * Both therefore survive 100 TB: they shuffle once on their natural
  * keys, broadcast nothing unbounded, and skew lands in AQE's lap like
  * any other keyed exchange.
  */
object TemporalJoins {

  /** Surfaces a time column as epoch-micros (timestamps) or its own
    * numeric value — one comparable domain for ordering and tolerance. */
  private def timeAsLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(c).cast("timestamp"))
      case LongType => col(c)
      case _ => col(c).cast("long")
    }

  /** Point-in-time (as-of) join: for every left row, attach the single
    * right row with the largest `rightTime <= leftTime` (`direction =
    * "backward"`, ties match) or smallest `rightTime >= leftTime`
    * (`"forward"`), equi-matched on `keys`. Left outer: unmatched rows
    * keep nulls. `tolerance` (same units as the time columns — micros for
    * timestamps) drops matches farther than the bound.
    *
    * Output = every left column, then the right side's non-key columns
    * prefixed with `rightPrefix`; prefixed names must not collide with
    * left columns (ambiguous output otherwise — fail loudly, not
    * last-writer-wins). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, keys: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      rightPrefix: String = ""): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    require(keys.forall(k => left.columns.contains(k) && right.columns.contains(k)),
      s"keys ${keys.mkString(",")} must exist on both sides")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val outNames = payloadCols.map(rightPrefix + _)
    val collisions = outNames.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns ${collisions.mkString(",")} collide with left " +
        "columns after prefixing — pass a distinct rightPrefix")

    // one tagged frame: left rows carry their full row struct, right rows
    // carry (payload, time); the other side's struct is a typed null
    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val rStruct = struct(
      (payloadCols.map(right(_)) :+
        timeAsLong(right, rightTime).as("_gf_rt")).toIndexedSeq: _*)
    val lSchema = left.select(lStruct.as("s")).schema("s").dataType
    val rSchema = right.select(rStruct.as("s")).schema("s").dataType

    val lTagged = left.select(
      (keys.map(left(_)) ++ Seq(
        timeAsLong(left, leftTime).as("_gf_t"), lit(1).as("_gf_side"),
        lStruct.as("_gf_l"), lit(null).cast(rSchema).as("_gf_r"))).toIndexedSeq: _*)
    val rTagged = right.select(
      (keys.map(right(_)) ++ Seq(
        timeAsLong(right, rightTime).as("_gf_t"), lit(0).as("_gf_side"),
        lit(null).cast(lSchema).as("_gf_l"), rStruct.as("_gf_r"))).toIndexedSeq: _*)

    // at equal times the right row must precede the left row in scan order
    // (side 0 < 1) so ties are matchable in BOTH directions
    val ordering =
      if (direction == "backward") Seq(col("_gf_t").asc, col("_gf_side").asc)
      else Seq(col("_gf_t").desc, col("_gf_side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withMatch = lTagged.unionByName(rTagged)
      .withColumn("_gf_m", last(col("_gf_r"), ignoreNulls = true).over(w))
      .filter(col("_gf_side") === 1)
    val inTol = tolerance match {
      case None => col("_gf_m").isNotNull
      case Some(tol) =>
        col("_gf_m").isNotNull &&
          abs(col("_gf_t") - col("_gf_m").getField("_gf_rt")) <= tol
    }
    val matched = withMatch
      .withColumn("_gf_m", when(inTol, col("_gf_m")))
    matched.select(
      (left.columns.map(c => matched.col(s"_gf_l.$c").as(c)) ++
        payloadCols.zip(outNames).map { case (c, o) =>
          matched.col(s"_gf_m.$c").as(o)
        }).toIndexedSeq: _*)
  }

  /** Interval (range) join: inner-join `points` rows to every `intervals`
    * row with `start <= point <= end` (inclusive), equi-matched on `keys`
    * (may be empty — pure containment). `bucketWidth` is the grid cell
    * size in the time columns' units (micros for timestamps): intervals
    * fan out to `length/bucketWidth` cells, so pick roughly the typical
    * interval length — and `maxCellsPerInterval` fails LOUDLY (task
    * error, zero rows served) if a rogue interval would explode the
    * fan-out, instead of silently materializing it.
    *
    * Output = every point column, then every non-key interval column;
    * names must be disjoint. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      keys: Seq[String] = Seq.empty, bucketWidth: Long,
      maxCellsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iPayload = intervals.columns.filterNot(keys.contains).toSeq
    val collisions = iPayload.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"interval columns ${collisions.mkString(",")} collide with point " +
        "columns — rename before joining")

    // integer `div` bucketing: double-division floor would silently lose
    // precision past 2^53 (epoch-NANOS longs live there today)
    val iCells = intervals
      .withColumn("_gf_s", timeAsLong(intervals, startCol))
      .withColumn("_gf_e", timeAsLong(intervals, endCol))
      // an inverted interval matches nothing — and must not reach
      // sequence(), whose negative auto-step would fan out junk cells
      .filter(col("_gf_e") >= col("_gf_s"))
      .withColumn("_gf_sb", expr(s"_gf_s div ${bucketWidth}L"))
      // the cells guard rides INSIDE the used end-bucket column — as a
      // separate dropped column Catalyst would prune it and the cap would
      // never fire
      .withColumn("_gf_eb", {
        val eb = expr(s"_gf_e div ${bucketWidth}L")
        val cells = eb - col("_gf_sb") + 1
        when(cells > maxCellsPerInterval,
          raise_error(concat(lit("rangeJoin: an interval spans "),
            cells.cast("string"),
            lit(s" cells (> $maxCellsPerInterval) at bucketWidth=" +
              s"$bucketWidth — widen the buckets or split the interval"))))
          .otherwise(eb)
      })
      .withColumn("_gf_b", explode(sequence(col("_gf_sb"), col("_gf_eb"))))
      .drop("_gf_sb", "_gf_eb")
    val pCell = points
      .withColumn("_gf_p", timeAsLong(points, pointCol))
      .withColumn("_gf_b", expr(s"_gf_p div ${bucketWidth}L"))

    // a matched (point, interval) pair meets in exactly ONE cell — the
    // point's — so the equi-join introduces no duplicates to dedup
    pCell.join(iCells, (keys :+ "_gf_b").toIndexedSeq)
      .filter(col("_gf_p") >= col("_gf_s") && col("_gf_p") <= col("_gf_e"))
      .select((points.columns.map(col) ++ iPayload.map(col)).toIndexedSeq: _*)
  }
}
