package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types.StructType

/** STREAMING NEAR-DUPLICATE INGEST GATE — the "have I seen something like
  * this before?" check a continuously-ingesting training-data pipeline runs
  * on every arriving document, as arbitrary streaming state over the
  * deterministic MinHash band index
  * ([[graft.dedup.Dedup.detMinhashBuckets]]).
  *
  * Shape: each arriving doc explodes into its `bands` (band, bucket) keys;
  * a [[StatefulProcessor]] keyed by band:bucket keeps ONE long of state —
  * the smallest doc id ever seen in that bucket (the KEEPER) — and tags
  * every arrival with it. A doc tagged by a keeper smaller than itself in
  * ANY band is a near-dup candidate against the accumulated index; exact
  * verification (the q212 Jaccard check) runs downstream on the candidates
  * only. Min-id keeper semantics make the gate ORDER-FREE within a batch
  * and across restarts (min is associative/commutative), so the drained
  * result is engine-exact: the q247 oracle recomputes keepers as a plain
  * GROUP BY min over the same md5-affine banding.
  *
  * Scale shape: state is one long per OCCUPIED bucket (RocksDB-backed —
  * disk-bounded, not heap), input shuffles once on the bucket key, and the
  * per-key work is O(rows in this batch for that bucket). The index never
  * stores documents or signatures — near-dup detection at ingest costs
  * bands longs per corpus bucket, the same economics as the batch LSH join
  * but maintained incrementally (no re-scan of the corpus per batch).
  * Cross-batch behavior (the actual point: batch N's docs gated against
  * batches 1..N-1's index) is pinned by NearDupGateSpec's two-drain test.
  */
object NearDupGate {

  case class BucketRow(bucket_key: String, band: Int, doc_id: Long)
  case class GateOut(doc_id: Long, band: Int, keeper_id: Long)

  /** Min-doc-id-per-bucket index: tags every arrival with its bucket's
    * keeper (after folding this batch in — order-free). */
  class MinKeeper extends StatefulProcessor[String, BucketRow, GateOut] {
    @transient private var minId: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minId = getHandle.getValueState[Long]("minId", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[BucketRow],
                                 timers: TimerValues): Iterator[GateOut] = {
      val batch = rows.toArray // bounded: docs sharing one band-bucket this batch
      var keeper = if (minId.exists()) minId.get() else Long.MaxValue
      var i = 0
      while (i < batch.length) {
        if (batch(i).doc_id < keeper) keeper = batch(i).doc_id
        i += 1
      }
      minId.update(keeper)
      val k = keeper
      batch.iterator.map(r => GateOut(r.doc_id, r.band, k))
    }
  }

  /** Drain a parquet document stream through the gate; returns one row per
    * drained doc: (doc_id, n_dup_bands, is_candidate) — candidate iff some
    * band's keeper is a SMALLER id (the index already held a near-dup).
    * Docs with fewer than 3 tokens produce no shingles and pass untagged
    * (absent), matching the batch pipeline's domain. */
  def gateOverParquet(spark: SparkSession, parquetGlob: String,
                      schema: StructType, name: String,
                      bands: Int = 8, rows: Int = 4,
                      statePartitions: Int = 8,
                      checkpoint: Option[String] = None): DataFrame = {
    StreamConf.withStreamConf(spark, statePartitions, rocksdb = true) {
      // a single-file source is a single input split: without this
      // round-robin exchange the md5-affine banding (the CPU-heavy part,
      // ~dozens of md5s per doc) runs on ONE core regardless of cluster
      // width. Min-id keeper semantics are order-free, so the exchange
      // cannot change the drained result — measured 276 s → 9 s at sf0.1
      val docs = spark.readStream.schema(schema).parquet(parquetGlob)
        .repartition(spark.sparkContext.defaultParallelism)
      val buckets = graft.dedup.Dedup.detMinhashBuckets(docs, "doc_id", "text", bands, rows)
        .select(concat_ws(":", col("band"), col("bucket")).as("bucket_key"),
          col("band"), col("id").as("doc_id"))
        .as[BucketRow](Encoders.product[BucketRow])
      // checkpoint: stable across drains = the INCREMENTAL index (batch N
      // gated against 1..N−1's state, offsets skip absorbed files) — the
      // memory sink refuses checkpoint recovery, so that path sinks via
      // foreachBatch into a per-drain buffer. None = a fresh temp per drain
      // (single-batch semantics, q247's oracle) through the memory sink.
      val tagged = buckets.groupByKey(_.bucket_key)(Encoders.STRING)
        .transformWithState(new MinKeeper, TimeMode.None(),
          OutputMode.Append())(Encoders.product[GateOut])
      val q = checkpoint match {
        case None =>
          tagged.writeStream
            .outputMode("append").format("memory").queryName(name)
            .trigger(Trigger.AvailableNow()).start()
        case Some(c) =>
          drainBuffers.put(name, new java.util.concurrent.ConcurrentLinkedQueue[GateOut]())
          tagged.writeStream
            .outputMode("append")
            .option("checkpointLocation", c)
            .foreachBatch { (df: org.apache.spark.sql.Dataset[GateOut], _: Long) =>
              val b = drainBuffers.get(name)
              df.collect().foreach(b.add) // test-scale sink; q247 uses memory
            }
            .trigger(Trigger.AvailableNow()).start()
      }
      // a FAILED drain must not pin its buffer in the static map for the
      // JVM lifetime (the success path consumes-and-removes it below)
      try q.awaitTermination()
      catch { case e: Throwable =>
        if (checkpoint.isDefined) drainBuffers.remove(name)
        throw e
      }
    }
    val drained = checkpoint match {
      case None => spark.table(name)
      case Some(_) =>
        import scala.collection.JavaConverters._
        val rows = drainBuffers.remove(name).asScala.toSeq
        spark.createDataFrame(rows)
    }
    drained
      // at-least-once foreachBatch can replay a batch after the buffer
      // already absorbed it: collapse to one row per (doc, band) keeping
      // the smallest keeper (keepers only ever decrease), so n_dup_bands
      // cannot double-count a replayed band
      .groupBy(col("doc_id"), col("band"))
      .agg(min(col("keeper_id")).as("keeper_id"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("keeper_id") < col("doc_id"), 1L).otherwise(0L)).as("n_dup_bands"))
      .select(col("doc_id"), col("n_dup_bands"), (col("n_dup_bands") > 0L).as("is_candidate"))
  }

  // per-drain foreachBatch buffers, keyed by query name (checkpointed path)
  private val drainBuffers =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[GateOut]]()
}
