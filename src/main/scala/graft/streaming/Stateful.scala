package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types.StructType

/** Arbitrary stateful streaming via Spark 4's `transformWithState` — the
  * successor to `flatMapGroupsWithState`, with typed per-key state primitives
  * (ValueState/ListState/MapState) backed by the RocksDB state store. The
  * reference's streaming path is fire-and-forget (SURVEY.md §2.10); this is
  * the headroom operator a 100 TB event pipeline needs: per-key running
  * aggregates whose state lives off-heap and incrementally checkpoints, so
  * state size is bounded by RocksDB + changelog, not executor heap.
  */
object Stateful {

  /** Per-key event row: money pre-scaled to exact integer cents so state math
    * never accumulates float error. */
  case class Ev(user_id: Long, cents: Long)

  /** Cumulative per-user aggregate emitted after each micro-batch. */
  case class UserAgg(user_id: Long, n_events: Long, cents: Long)

  /** Running per-user (count, exact-cents sum). ValueState[UserAgg] is one
    * RocksDB point-lookup + put per key per batch — O(keys-in-batch), not
    * O(all-keys).
    */
  class RunningUserAgg extends StatefulProcessor[Long, Ev, UserAgg] {
    @transient private var state: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserAgg]("agg",
        Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues): Iterator[UserAgg] = {
      var n = 0L; var cents = 0L
      rows.foreach { e => n += 1; cents += e.cents }
      val prev = if (state.exists()) state.get() else UserAgg(key, 0L, 0L)
      val next = UserAgg(key, prev.n_events + n, prev.cents + cents)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Open per-user session carried across micro-batches. */
  case class OpenSession(start_us: Long, last_us: Long, n_events: Long)

  /** Closed session emitted downstream. */
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Timer-driven sessionization — the full arbitrary-state surface:
    * ValueState for the open session, event-time TIMERS to close it when the
    * watermark passes last-event + gap. Within a batch, a key's rows arrive
    * unordered: they are sorted and gap-split locally (sessions closed by a
    * later event emit immediately); the still-open tail goes to state with a
    * timer at `last + gap`. A newer batch re-registers the timer and deletes
    * the stale one; a stale expiry that races anyway is ignored by checking
    * it against the state's own deadline. Sessions open when the input ends
    * stay in state — exactly a real stream's semantics (they would close on
    * the next event or watermark advance).
    */
  class SessionizeTimers(gapUs: Long) extends StatefulProcessor[Long, TsEv, SessionOut] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def timerMsOf(sess: OpenSession): Long = (sess.last_us + gapUs) / 1000L

    override def handleInputRows(key: Long, rows: Iterator[TsEv],
                                 timers: TimerValues): Iterator[SessionOut] = {
      val ts = rows.map(_.ts_us).toArray
      java.util.Arrays.sort(ts)
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur = if (open.exists()) {
        getHandle.deleteTimer(timerMsOf(open.get()))
        open.get()
      } else OpenSession(ts(0), ts(0) - 1, 0L) // sentinel; first event absorbs it
      for (t <- ts) {
        if (cur.n_events > 0L && t - cur.last_us > gapUs) {
          out += SessionOut(key, cur.start_us, cur.last_us, cur.n_events)
          cur = OpenSession(t, t, 1L)
        } else {
          // math.min: a LATE (within-watermark) cross-batch event can
          // precede the restored session's start — the same rule
          // Sessionize.sessionize applies, without which session_start is
          // wrong (batch rows arrive sorted, so only restored state can
          // make t < start)
          val start = if (cur.n_events == 0L) t else math.min(cur.start_us, t)
          cur = OpenSession(start, math.max(cur.last_us, t), cur.n_events + 1L)
        }
      }
      open.update(cur)
      getHandle.registerTimer(timerMsOf(cur))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!open.exists()) return Iterator.empty
      val cur = open.get()
      if (expired.getExpiryTimeInMs != timerMsOf(cur)) return Iterator.empty // stale
      open.clear()
      Iterator.single(SessionOut(key, cur.start_us, cur.last_us, cur.n_events))
    }
  }

  /** Per-key event timestamp (µs since epoch, exact integer). */
  case class TsEv(user_id: Long, ts_us: Long)

  /** Typed event for the MapState counter. */
  case class TypedEv(user_id: Long, event_type: String)

  /** Per-(user, event_type) cumulative count emitted after each batch. */
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user categorical counters in MapState — the third state primitive
    * (ValueState: q144, timers: q156, MapState: here). Each event type is one
    * RocksDB map entry under the user's grouping key: updating one type never
    * rewrites the others (a ValueState[Map] would), which is the difference
    * between O(types-in-batch) and O(all-types) state I/O per user per batch.
    */
  class TypeCounters extends StatefulProcessor[Long, TypedEv, TypeCount] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
                                 timers: TimerValues): Iterator[TypeCount] = {
      val delta = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach(e => delta(e.event_type) = delta.getOrElse(e.event_type, 0L) + 1L)
      delta.toSeq.sortBy(_._1).map { case (t, d) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + d
        counts.updateValue(t, n)
        TypeCount(key, t, n)
      }.iterator
    }
  }

  /** Drain the event stream through [[TypeCounters]]; the converged answer is
    * the batch groupBy(user, type) count — the oracle. */
  def typeCountsOverParquet(spark: SparkSession, parquetGlob: String,
                            schema: StructType, name: String,
                            statePartitions: Int = 8): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions, rocksdb = true) {
      val evs = spark.readStream.schema(schema).parquet(parquetGlob)
        .select(col("user_id"), col("event_type"))
        .as[TypedEv](Encoders.product[TypedEv])
      val q = evs.groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new TypeCounters, TimeMode.None(),
          OutputMode.Update())(Encoders.product[TypeCount])
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .groupBy("user_id", "event_type")
      .agg(max(col("n")).as("n")) // cumulative ⇒ the final value is the max
  }

  /** Drain the parquet event stream through [[SessionizeTimers]] with an
    * event-time watermark; returns every session the stream CLOSED — by a
    * follow-on event in-batch, or by a timer once the final watermark passed
    * its deadline. Deterministic for a bounded drain: the final watermark is
    * max(ts) − delay, so the emitted set is exactly computable by the batch
    * oracle.
    */
  def timerSessionsOverParquet(spark: SparkSession, parquetGlob: String,
                               schema: StructType, tsUsExpr: String,
                               gapUs: Long, delay: String, name: String,
                               statePartitions: Int = 8,
                               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions, rocksdb = true) {
      val reader = spark.readStream.schema(schema)
      val evs = maxFilesPerTrigger
        .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
        .parquet(parquetGlob)
        .select(col("user_id"), expr(tsUsExpr).cast("long").as("ts_us"))
        .withColumn("__ts", timestamp_micros(col("ts_us")))
        .withWatermark("__ts", delay)
        .select(col("user_id"), col("ts_us"))
        .as[TsEv](Encoders.product[TsEv])
      val q = evs.groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new SessionizeTimers(gapUs), TimeMode.EventTime(),
          OutputMode.Append())(Encoders.product[SessionOut])
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** Drain a parquet-backed event stream through the stateful processor with
    * `Trigger.AvailableNow`, returning the FINAL per-user aggregate. Update
    * mode re-emits a key's running total each batch it appears in; the final
    * row per key is the one with the highest n_events (strictly increasing),
    * recovered with a max(struct) — no window needed.
    */
  def runningUserAggOverParquet(spark: SparkSession, parquetGlob: String,
                                schema: StructType, centsExpr: String,
                                name: String,
                                statePartitions: Int = 8): DataFrame = {
    // transformWithState requires the RocksDB provider (TWS state schema is
    // not supported by the default HDFS-backed store)
    StreamConf.withStreamConf(spark, statePartitions, rocksdb = true) {
      val evs: Dataset[Ev] = spark.readStream.schema(schema).parquet(parquetGlob)
        .select(col("user_id"), expr(centsExpr).cast("long").as("cents"))
        .as[Ev](Encoders.product[Ev])
      val q = evs.groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new RunningUserAgg, TimeMode.None(),
          OutputMode.Update())(Encoders.product[UserAgg])
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("cents"))).as("last"))
      .select(col("user_id"), col("last.n_events").as("n_events"),
        col("last.cents").as("cents"))
  }
}
