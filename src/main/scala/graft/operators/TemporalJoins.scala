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
    * last-writer-wins).
    *
    * SKEW: the window puts each key's FULL history in one task. That is
    * the right plan for many keys of moderate size, but one pathological
    * key (a single instrument with billions of ticks) serializes into a
    * single task. `bucketWidth` opts into the time-bucketed variant:
    * windows partition by (keys, `t div bucketWidth`) — a hot key splits
    * across its time range — and each bucket receives a CARRY-IN row (the
    * nearest right row from preceding buckets for backward, following for
    * forward; bucket index orders times, so the nearest carrying bucket's
    * best IS the global best beyond the boundary) so matches cross bucket
    * borders exactly as in the unbucketed plan. Cost: one extra
    * (key, bucket)-grain aggregate + a metadata-sized carry union —
    * results are row-identical (parity-pinned in TemporalJoinsSpec) for
    * non-null times; null time values are ordered first within a bucket
    * in this variant (they see carry rows), so keep `bucketWidth` off if
    * null times carry meaning. Pick roughly (hot-key rows / target rows
    * per task) × typical spacing. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, keys: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      rightPrefix: String = "", bucketWidth: Option[Long] = None): DataFrame = {
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

    val backward = direction == "backward"
    // at equal times the right row must precede the left row in scan order
    // (side 0 < 1, carry -1 first) so ties are matchable in BOTH directions
    val withMatch = bucketWidth match {
      case None =>
        val ordering =
          if (backward) Seq(col("_gf_t").asc, col("_gf_side").asc)
          else Seq(col("_gf_t").desc, col("_gf_side").asc)
        val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lTagged.unionByName(rTagged)
          .withColumn("_gf_m", last(col("_gf_r"), ignoreNulls = true).over(w))
          .filter(col("_gf_side") === 1)
      case Some(width) =>
        require(width > 0, "bucketWidth must be positive")
        val bk = expr(s"_gf_t div ${width}L")
        val lB = lTagged.withColumn("_gf_bk", bk)
        val rB = rTagged.withColumn("_gf_bk", bk)
        // per (key, bucket): the boundary-best right row. Bucket index
        // orders times (t div W is monotone), so the nearest carrying
        // bucket's best is the global best beyond the border.
        val kb = (keys :+ "_gf_bk").map(col)
        val summary = rB.groupBy(kb: _*).agg(
          (if (backward) max_by(col("_gf_r"), col("_gf_t"))
           else min_by(col("_gf_r"), col("_gf_t"))).as("_gf_rl"))
        // every bucket the LEFT side occupies needs a carry, including
        // buckets with no right rows of their own — full outer keeps both
        val leftBk = lB.select(kb: _*).distinct()
        val cw = Window.partitionBy(keys.map(col): _*)
          .orderBy(if (backward) col("_gf_bk").asc else col("_gf_bk").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = leftBk.join(summary, keys :+ "_gf_bk", "full_outer")
          .withColumn("_gf_c", last(col("_gf_rl"), ignoreNulls = true).over(cw))
          .filter(col("_gf_c").isNotNull)
          .select((keys.map(col) ++ Seq(
            lit(null).cast("long").as("_gf_t"),
            lit(-1).as("_gf_side"),
            lit(null).cast(lSchema).as("_gf_l"),
            col("_gf_c").as("_gf_r"),
            col("_gf_bk"))).toIndexedSeq: _*)
        // carry rows ride a NULL time ordered FIRST within the bucket —
        // no boundary-time arithmetic, so negative epochs and truncating
        // `div` need no special casing; any real in-bucket right row
        // supersedes the carry via `last`
        val ordering =
          if (backward) Seq(col("_gf_t").asc_nulls_first, col("_gf_side").asc)
          else Seq(col("_gf_t").desc_nulls_first, col("_gf_side").asc)
        val w = Window.partitionBy(kb: _*).orderBy(ordering: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lB.unionByName(rB).unionByName(carries)
          .withColumn("_gf_m", last(col("_gf_r"), ignoreNulls = true).over(w))
          .filter(col("_gf_side") === 1)
          .drop("_gf_bk")
    }
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
