package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` (the capability tier above the reference's
  * stateless event path — SURVEY §2.10 notes the reference has no stateful
  * ops; this is the standard shape a real event pipeline grows into).
  *
  * State per user = the currently-open session. A session closes when the
  * event-time watermark passes `last event + gap` (EventTimeTimeout), so
  * results are deterministic under out-of-order delivery within the
  * watermark. State size is O(1) per active key — safe at any key
  * cardinality; the state store shards by key across executors.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  /** Events must already carry a watermark on `ts` (caller:
    * `.withWatermark("ts", ...)`) for EventTimeTimeout to fire. */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
      val incoming = evs.map(_.ts.getTime).toSeq.sorted
      if (incoming.isEmpty) {
        // timeout fired: watermark passed end+gap -> close the open session
        val out = state.getOption.map(s =>
          Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n))
        state.remove()
        out.iterator
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption
        incoming.foreach { t =>
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              // a late (within-watermark) event from a later micro-batch can
              // precede the open session's start — lower it, or session_start
              // is wrong under the out-of-order delivery we claim to handle
              cur = Some(OpenSession(math.min(s.start, t), math.max(s.end, t), s.n + 1))
            case Some(s) =>
              closed ::= Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
              cur = Some(OpenSession(t, t, 1))
            case None =>
              cur = Some(OpenSession(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverse.iterator
      }
    }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Batch twin of [[sessionize]] — the same gap semantics as two windows
    * over the full history: a session-break flag (`gap exceeded vs previous
    * event`) and its running sum as the per-user session index, then one
    * aggregation per session. ONE shuffle on the user key for both windows
    * plus a partial-aggregated groupBy; no state store. Differentially
    * tested against the streaming form (SessionizeSpec) — closed streaming
    * sessions must equal the batch answer on the same events.
    *
    * @param tiebreak orders simultaneous events deterministically (session
    *                 CONTENT is order-insensitive on ties, but determinism
    *                 keeps cross-engine comparisons exact)
    */
  /** Per-EVENT session assignment (the window half of [[batch]]): every
    * input row comes back with its `session_idx`, for analyses that need
    * event-level context inside sessions (in-session funnels, dwell gaps)
    * rather than just session summaries.
    */
  def batchAssign(events: DataFrame, userCol: String, tsCol: String, gapMinutes: Int,
                  tiebreak: Seq[Column] = Nil): DataFrame = {
    val wOrd = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc +: tiebreak.map(_.asc): _*)
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(wOrd))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) > col("__prev") + gap, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new")
  }

  def batch(events: DataFrame, userCol: String, tsCol: String, gapMinutes: Int,
            tiebreak: Seq[Column] = Nil): DataFrame =
    batchAssign(events, userCol, tsCol, gapMinutes, tiebreak)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Spark's NATIVE session windows (`session_window` grouping) — the
    * engine-supported form of [[batch]]: one `groupBy(session_window(ts,
    * gap), user)` does the break detection and the aggregation in a single
    * operator (physically: shuffle on the user key, in-partition sort, then
    * session merge inside the aggregate — same one-shuffle cost as [[batch]]
    * but without materializing two window passes, and it runs unchanged in
    * Structured Streaming with a watermark).
    *
    * Boundary semantics (measured, Round3Spec): Spark merges a new event
    * into the current session when its window `[ts, ts+gap)` starts at or
    * before the session's end, i.e. merge iff `diff <= gap` — two events
    * exactly `gap` apart are the SAME session, matching [[batch]].
    * `session_end` is `last_ts + gap` (the window bound), not the last
    * event time.
    */
  def sessionWindows(events: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
