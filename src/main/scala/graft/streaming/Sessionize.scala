package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — the canonical
  * custom-state Structured Streaming operator
  * (`KeyValueGroupedDataset.flatMapGroupsWithState` with event-time
  * timeout), paired with a batch twin whose window-function arithmetic is
  * exactly SQL-replayable (the correctness-gate oracle).
  *
  * A session is a maximal run of one user's events where consecutive
  * event times are ≤ `gap` apart. The batch twin computes it with the
  * standard lag/cumulative-sum trick (one exchange by user + one
  * in-partition sort — at 100 TB this is the minimal shape for exact
  * sessions); the streaming side keeps ONE open session per user in the
  * state store and closes it either when a farther-than-gap event
  * arrives (emitted immediately) or when the event-time watermark passes
  * `session_end + gap` (event-time timeout — no more in-gap events can
  * exist). State per user is four numbers; watermark-late events are
  * dropped by Spark upstream, identically to every watermarked operator.
  */
object Sessionize {

  /** One closed session (times in epoch microseconds). */
  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, total_value: Double)

  /** The open session carried in the state store. */
  final case class OpenSession(start: Long, end: Long, n: Long, total: Double)

  /** HALF_UP to 2 decimals — the same rounding `functions.round` applies
    * in the batch twin, so the two surfaces report identical totals. */
  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Batch twin: lag > gap marks session starts, their running count is
    * the session id, one aggregate per (user, session). `tsCol` is a
    * NUMERIC event time (epoch nanos/millis — any unit, with `gap` in the
    * same unit): numeric time keeps the oracle arithmetic identical in
    * every engine. Per-event values round to 2 before summing (the
    * FP-addition-order-proof pattern the other oracled sums use). */
  def sessionizeBatch(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("_gf_new",
        when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0))
      .withColumn("_gf_sid", sum("_gf_new").over(w))
      .groupBy(col(userCol), col("_gf_sid"))
      .agg(min(tsCol).as("session_start"), max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(round(col(valueCol), 2)), 2).as("total_value"))
      .select(col(userCol), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
  }

  /** Streaming sessionization: `tsCol` must be a TIMESTAMP column (the
    * watermark anchor); emitted times are epoch MICROS (the batch twin's
    * unit when fed `unix_micros`). `gapMicros` plays the batch twin's
    * `gap`; `watermarkDelay` bounds out-of-orderness. Emits a session
    * exactly once, when it can no longer grow. */
  def sessionizeStream(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapMicros: Long,
      watermarkDelay: String): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df
      .withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long"), col(tsCol),
        unix_micros(col(tsCol)), round(col(valueCol).cast("double"), 2))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: no in-gap event can arrive now
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.end, s.n, round2(s.total)))
          } else {
            // a micro-batch delivers a group's rows in arbitrary order
            val evs = rows.toArray.sortBy(_._3)
            var open = state.getOption
            val out = Vector.newBuilder[Session]
            evs.foreach { case (_, _, t, v) =>
              open match {
                case Some(s) if t - s.end <= gapMicros =>
                  open = Some(OpenSession(s.start, math.max(s.end, t),
                    s.n + 1, s.total + v))
                case Some(s) =>
                  out += Session(user, s.start, s.end, s.n, round2(s.total))
                  open = Some(OpenSession(t, t, 1, v))
                case None =>
                  open = Some(OpenSession(t, t, 1, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeouts are epoch MILLIS: floor the micros deadline and
              // add 1 ms slack (never early — a late close is harmless,
              // an early one would split a live session); and the timeout
              // must sit above the current watermark — a session already
              // older than watermark - gap closes on the NEXT batch's
              // sweep instead of throwing here
              state.setTimeoutTimestamp(math.max(
                (s.end + gapMicros) / 1000 + 1,
                state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
