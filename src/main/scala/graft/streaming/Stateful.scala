package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
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
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // transformWithState requires the RocksDB provider (TWS state schema is
    // not supported by the default HDFS-backed store)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (prevProvider.nonEmpty)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
      else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    spark.table(name)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("cents"))).as("last"))
      .select(col("user_id"), col("last.n_events").as("n_events"),
        col("last.cents").as("cents"))
  }
}
