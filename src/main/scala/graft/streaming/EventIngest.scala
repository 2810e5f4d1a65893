package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.schema.Schemas

/** Structured-Streaming re-expression of the reference's event path
  * (SURVEY §2.10): Pub/Sub pull → republish → append-metadata-row → trigger
  * (dependencies/receiver.py, publisher.py, cloud_function/main.py).
  *
  * The local analog of a Pub/Sub subscription is a file-source stream over a
  * directory of JSON event payloads; `Trigger.AvailableNow` reproduces the
  * reference's bounded drain (receiver.py:10 `timeout = 10.0` — "consume
  * what's queued, then stop"). Append-mode file sinks give at-least-once
  * delivery, strictly stronger than the reference (ack-after-buffer can drop
  * messages on crash; republish duplicates — its own staging `.distinct()`
  * absorbs that, and ours does too).
  *
  * At scale this is the same code: the `sourceFormat`/`sourceOptions` seam
  * swaps the file source for a message-bus connector with NO code change at
  * the call site — the transforms and sinks are unchanged. Mapping for the
  * Kafka connector (shipped with Spark as spark-sql-kafka; any DataSource-V2
  * streaming source with the same row contract drops in identically):
  *
  *   sourceFormat  = "kafka"
  *   sourceOptions = Map("kafka.bootstrap.servers" -> "…",
  *                       "subscribe" -> topic,
  *                       "startingOffsets" -> "earliest")
  *
  * Bus sources emit a binary `value` envelope rather than typed columns, so
  * the seam parses it with `from_json(value, schema)` — the exact analog of
  * the reference's Pub/Sub payload decode (receiver.py:23-30
  * `json.loads(message.data)`). File formats keep the schema-on-read path.
  * The drain/republish/trigger semantics (AvailableNow, at-least-once,
  * checkpointed offsets) are source-agnostic Structured Streaming contracts.
  */
object EventIngest {

  /** Formats whose rows arrive as a (key, value, topic, …) bus envelope and
    * need the payload parsed out of `value`, vs file formats that apply the
    * schema at read time. `graft-bus` ([[BusSource]]) is the in-process DSv2
    * connector with the identical envelope — it proves this branch executes
    * end-to-end without a broker. */
  private val busFormats = Set("kafka", BusSource.ShortName)

  /** The connector seam: a streaming DataFrame of TYPED event rows from
    * either a file directory (local stand-in, SURVEY §2.10) or a message-bus
    * connector — callers downstream never see the difference.
    */
  def eventSource(spark: SparkSession, pathOrTopic: String,
                  schema: StructType = Schemas.eventMetadata,
                  sourceFormat: String = "json",
                  sourceOptions: Map[String, String] = Map.empty): DataFrame =
    if (busFormats(sourceFormat)) {
      // pathOrTopic IS the topic in bus mode — default it into the
      // connector's `subscribe` option so the documented no-code-change
      // swap (same call site, different format) actually holds; an
      // explicit sourceOptions("subscribe") still wins
      val opts =
        if (sourceOptions.contains("subscribe")) sourceOptions
        else sourceOptions + ("subscribe" -> pathOrTopic)
      spark.readStream.format(sourceFormat).options(opts).load()
        .select(from_json(col("value").cast("string"), schema).as("__e"))
        .select(col("__e.*"))
    } else {
      spark.readStream.schema(schema).options(sourceOptions)
        .format(sourceFormat).load(pathOrTopic)
    }

  /** ST1+ST3 — drain queued events, append rows to the metadata table
    * (cloud_function/main.py:34-47 `insert_rows` analog). Blocks until the
    * drain completes.
    */
  def ingestAvailable(spark: SparkSession, eventsDir: String, metaPath: String,
                      schema: StructType = Schemas.eventMetadata,
                      sourceFormat: String = "json",
                      sourceOptions: Map[String, String] = Map.empty): Unit = {
    val q = eventSource(spark, eventsDir, schema, sourceFormat, sourceOptions)
      .withColumn("ingested_at", current_timestamp())
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", metaPath)
      .option("checkpointLocation", s"${metaPath}__chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** ST2 — republish: forward drained messages to a downstream "topic"
    * (publisher.py:14-21). At-least-once, no dedup — faithful. The sink seam
    * mirrors the source seam: "json" to a directory locally; "kafka" +
    * options(kafka.bootstrap.servers, topic) publishes to a real bus (the
    * payload must then be packed into a `value` column — to_json(struct(*))
    * — which is exactly the inverse of [[eventSource]]'s decode).
    */
  def republishAvailable(spark: SparkSession, eventsDir: String, topicDir: String,
                         schema: StructType = Schemas.eventMetadata,
                         sourceFormat: String = "json",
                         sourceOptions: Map[String, String] = Map.empty,
                         sinkFormat: String = "json",
                         sinkOptions: Map[String, String] = Map.empty,
                         checkpoint: Option[String] = None): Unit = {
    val src = eventSource(spark, eventsDir, schema, sourceFormat, sourceOptions)
    val packed = if (busFormats(sinkFormat))
      src.select(to_json(struct(col("*"))).cast("binary").as("value"))
    else src
    // bus sinks: `topicDir` is a TOPIC, not a path — a `path` option is
    // spurious, and deriving the checkpoint from the topic string yields a
    // RELATIVE cwd path that loses the offset log on a cwd change; require
    // an explicit checkpoint instead. File sinks keep the co-located
    // `<dir>__chk` default.
    val base = packed.writeStream.outputMode("append").format(sinkFormat)
    val sunk =
      if (busFormats(sinkFormat)) {
        val chk = checkpoint.getOrElse(throw new IllegalArgumentException(
          s"republishAvailable: a bus sink ($sinkFormat) needs an explicit " +
            "checkpoint location — the topic name is not a filesystem path"))
        base.option("topic", topicDir).options(sinkOptions)
          .option("checkpointLocation", chk)
      } else
        base.option("path", topicDir).options(sinkOptions)
          .option("checkpointLocation", checkpoint.getOrElse(s"${topicDir}__chk"))
    val q = sunk.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** ST4 — event-driven trigger: run `callback` per micro-batch of events
    * (composer2_airflow_rest_api.py dagRuns POST analog — e.g. kick a batch
    * pipeline Runner when an extract-arrival event lands).
    */
  def onEvents(spark: SparkSession, eventsDir: String, checkpoint: String,
               schema: StructType = Schemas.eventMetadata,
               sourceFormat: String = "json",
               sourceOptions: Map[String, String] = Map.empty)
              (callback: (DataFrame, Long) => Unit): Unit = {
    val q = eventSource(spark, eventsDir, schema, sourceFormat, sourceOptions)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(callback)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** ST4 as a LISTENER (the push-side analog of [[onEvents]]'s foreachBatch):
    * a session-level StreamingQueryListener that fires `onBatch(queryName,
    * batchId, numInputRows)` after every micro-batch that ingested rows —
    * the hook a batch-pipeline Runner registers so extract-arrival events
    * trigger the transform chains (the reference's Cloud Function → Airflow
    * dagRuns POST, composer2_airflow_rest_api.py:40-67). Returns the
    * listener so callers can remove it.
    */
  def onProgressTrigger(spark: SparkSession)
                       (onBatch: (String, Long, Long) => Unit): org.apache.spark.sql.streaming.StreamingQueryListener = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          onBatch(Option(e.progress.name).getOrElse(""), e.progress.batchId, e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    l
  }

  /** Beyond-reference headroom: watermarked tumbling-window counts over an
    * event stream — the standard streaming aggregation shape (late data
    * dropped past the watermark; append output per closed window).
    */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     window: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Bounded EVENT-TIME-WINDOWED streaming aggregation (tumbling windows +
    * watermark) to an in-memory sink — the driver-contract query q60: the
    * oracle is the batch `date_trunc` answer, proving the windowed streaming
    * path and batch agree. Complete output mode so the final (never-closed
    * under AvailableNow) window is emitted too — the batch answer includes
    * it. Same state-partition sizing rationale as
    * [[streamCountsOverParquet]].
    */
  def streamWindowedCountsOverParquet(spark: SparkSession, parquetGlob: String,
                                      schema: StructType, tsExpr: String,
                                      windowLen: String, watermark: String,
                                      name: String,
                                      statePartitions: Int = 8,
                                      slide: Option[String] = None): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions) {
      val q = spark.readStream.schema(schema).parquet(parquetGlob)
        .withColumn("__ts", expr(tsExpr))
        .withWatermark("__ts", watermark)
        // SLIDING windows when `slide` < `windowLen`: each event lands in
        // windowLen/slide overlapping epoch-aligned windows (the hopping
        // aggregation); default is tumbling (slide == length)
        .groupBy(window(col("__ts"), windowLen, slide.getOrElse(windowLen)), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        // NTZ for cross-engine comparison (watermark itself needs TIMESTAMP);
        // session TZ is UTC so the wall-clock value is unchanged
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("cnt"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }

  /** STREAMING DEDUPLICATION (`dropDuplicatesWithinWatermark`) over a bounded
    * drain — the streaming twin of the batch `.distinct()` staging dedup
    * (A4/A5): exactly-once per `idCols` key within the watermark horizon,
    * state expiring as event time advances. At 100 TB-ingest scale this is
    * the operator that absorbs the at-least-once duplicates of the
    * republish path (ST2) without holding unbounded state — key state is
    * dropped once the watermark passes, so memory is O(keys-per-horizon),
    * not O(keys-ever). The driver-contract query q72 runs it with a horizon
    * wider than the dataset so the batch `COUNT(DISTINCT)` oracle is exact.
    * Dedup emits in append mode to the sink; the per-type counts are then a
    * batch aggregate over the sink table.
    */
  def streamDedupCountsOverParquet(spark: SparkSession, parquetGlob: String,
                                   schema: StructType, tsExpr: String,
                                   watermark: String, idCols: Seq[String],
                                   name: String,
                                   statePartitions: Int = 8): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions) {
      val q = spark.readStream.schema(schema).parquet(parquetGlob)
        .withColumn("__ts", expr(tsExpr))
        .withWatermark("__ts", watermark)
        .dropDuplicatesWithinWatermark(idCols)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
  }

  /** Continuous UPSERT ingest: each drained micro-batch is MERGEd into a
    * warehouse table by key (`foreachBatch` → Warehouse.merge) — the
    * streaming form of the O(delta) incremental load (vs the reference's
    * daily WRITE_TRUNCATE rebuild). The checkpoint makes the file source
    * exactly-once across drains (a re-run never re-reads absorbed files),
    * and merge-by-key makes each batch idempotent on top of that — the
    * at-least-once duplicates of the republish path (ST2) collapse into
    * the key. In-batch duplicates are pre-collapsed with
    * `dropDuplicates(keys)` so one batch cannot insert a key twice.
    */
  def streamMergeIntoWarehouse(spark: SparkSession, sourceDir: String,
                               schema: StructType, wh: graft.io.Warehouse,
                               table: String, keys: Seq[String],
                               checkpoint: String,
                               format: String = "parquet"): Unit = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => wh.merge(table, batch.dropDuplicates(keys), keys)
    val q = spark.readStream.schema(schema).format(format).load(sourceDir)
      .writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** STREAM–STREAM inner join with watermarks and an event-time range
    * condition — the one stateful-join shape Structured Streaming supports
    * natively, and the streaming twin of the batch range join (q29): every
    * `rightType` event is matched to the `leftType` events of the same user
    * that preceded it by at most `maxDelay` (the attribution join). Both
    * sides carry a watermark and the join predicate bounds `r_ts` in
    * [`l_ts`, `l_ts` + `maxDelay`], so each side's buffered state is evicted
    * once the other side's watermark passes — state is O(events-per-horizon)
    * per key, not O(stream) (this is what makes the operator viable over an
    * unbounded 100 TB/day feed; an unconstrained stream join would buffer
    * forever). Pair rows land append-mode in the sink; the returned frame is
    * the per-user pair/count rollup, whose oracle is the equivalent batch
    * self-join.
    */
  def streamStreamJoinOverParquet(spark: SparkSession, parquetGlob: String,
                                  schema: StructType, tsExpr: String,
                                  leftType: String, rightType: String,
                                  maxDelay: String, name: String,
                                  statePartitions: Int = 8): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions) {
      val src = spark.readStream.schema(schema).parquet(parquetGlob)
        .withColumn("__ts", expr(tsExpr))
      val left = src.filter(col("event_type") === leftType)
        .select(col("user_id"), col("__ts").as("l_ts"), col("event_id").as("l_id"))
        .withWatermark("l_ts", maxDelay)
      val right = src.filter(col("event_type") === rightType)
        .select(col("user_id").as("r_user"), col("__ts").as("r_ts"), col("event_id").as("r_id"))
        .withWatermark("r_ts", maxDelay)
      val q = left.join(right,
          col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"))
        .select(col("user_id"), col("l_id"), col("r_id"))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("l_id")).as("n_lefts"),
        countDistinct(col("r_id")).as("n_rights"))
  }

  /** STREAM–STATIC JOIN — enrich a stream with a batch dimension table, the
    * most common production streaming join and the one that needs NO state
    * at all: the static side is (re)broadcast per micro-batch, stream rows
    * flow through pipelined (contrast q91's stream–stream join, which must
    * buffer both sides to a watermark horizon). At scale the dim refresh
    * cadence is the broadcast cadence; the stream side never shuffles.
    * Enriched rows land append-mode; the caller aggregates the sink table.
    */
  def streamStaticEnrichOverParquet(spark: SparkSession, parquetGlob: String,
                                    schema: StructType, dim: DataFrame,
                                    joinKeyExpr: String, dimKeyCol: String,
                                    keep: Seq[String], name: String): DataFrame = {
    val q = spark.readStream.schema(schema).parquet(parquetGlob)
      .withColumn("__jk", expr(joinKeyExpr))
      .join(broadcast(dim), col("__jk") === col(dimKeyCol))
      .select(keep.map(col): _*)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Bounded streaming aggregation to an in-memory sink, returned as a
    * DataFrame — used by the driver-contract query q51: proves the streaming
    * path computes the same answer as the batch oracle.
    *
    * `statePartitions` sizes the stateful shuffle: a streaming agg opens one
    * state-store instance per shuffle partition and pays its load/commit on
    * every micro-batch, so the partition count should track the expected
    * DISTINCT-KEY cardinality, not the session default (here: a handful of
    * event types — 32 stores would be 4× pure overhead). Fixed at the first
    * checkpoint, so it is set for this query only and restored after.
    */
  def streamCountsOverParquet(spark: SparkSession, parquetGlob: String,
                              schema: StructType, name: String,
                              statePartitions: Int = 8): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions) {
      val q = spark.readStream.schema(schema).parquet(parquetGlob)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
  }
}
