package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.io.Versioned

/** EXACTLY-ONCE streaming append into a [[graft.io.Versioned]] table.
  *
  * Structured Streaming's own guarantee stops at the checkpoint: `foreachBatch`
  * is at-least-once, because a batch can be fully written to the sink and the
  * process die before the offset checkpoint advances — on restart the batch is
  * re-delivered (same batchId, same rows). File/console sinks simply eat the
  * duplicate rows. Here the sink is transactional, so the duplicate is
  * REJECTED instead: [[Versioned.commitAppendTxn]] records an
  * (appId → batchId) watermark inside the committed manifest — atomically
  * with the data it describes — and a replayed batch is a no-op. That is the
  * public Delta-sink idempotence design (txn action + foreachBatch), and the
  * reason table contents are exactly-once even though delivery is not.
  *
  * At scale nothing changes: each micro-batch stages O(delta) parquet and
  * publishes one manifest line-set; the append loop never rewrites history,
  * and concurrent writers (two streams into one table) are serialized by the
  * manifest rename race, each retrying against the other's snapshot.
  */
object VersionedSink {

  /** Drain a bounded file-source stream into `vt.table` with exactly-once
    * table contents. `appId` identifies this logical stream across restarts
    * (use the checkpoint's identity, not a random UUID — the watermark only
    * protects replays that share the appId). */
  def appendStream(spark: SparkSession, sourceGlob: String, schema: StructType,
                   vt: Versioned, table: String, checkpoint: String,
                   appId: String, format: String = "parquet"): Unit = {
    val fn: (org.apache.spark.sql.Dataset[Row], Long) => Unit =
      (batch, batchId) => { vt.commitAppendTxn(table, batch.toDF(), appId, batchId); () }
    val q = spark.readStream.schema(schema).format(format).load(sourceGlob)
      .writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
