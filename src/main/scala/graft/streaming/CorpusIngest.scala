package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.io.Warehouse
import graft.text.TextOps

/** The composed training-data ingestion pipeline — the library's operators
  * chained into one checkpointed stream: every drained batch of raw documents
  * is normalized, quality-gated, exact-deduped (within the batch AND against
  * everything already ingested), then accepted rows land in the corpus table
  * and rejects in a quarantine table with their reason.
  *
  * Idempotence is layered: the checkpoint stops re-reading absorbed files
  * across drains; the fingerprint anti-join stops re-appending rows even if a
  * crashed batch retries (at-least-once delivery collapses to effective
  * exactly-once per fingerprint). At 100 TB the anti-join's right side is a
  * fingerprint-only column scan of the corpus — pruned parquet, not the
  * texts.
  */
object CorpusIngest {

  /** Normalized text + content fingerprint, the dedup identity. */
  private def withDerived(df: Dataset[Row]): Dataset[Row] = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    df.withColumn("norm_text", norm)
      .withColumn("fp", md5(col("norm_text")))
      .withColumn("quality", TextOps.qualityBucket(col("norm_text")))
  }

  /** Drain `sourceGlob` into `corpusTable` (accepted) + `rejectTable`
    * (quarantined, with reason). Returns (accepted, rejected) row counts for
    * this drain.
    */
  def run(spark: SparkSession, sourceGlob: String, schema: StructType,
          wh: Warehouse, corpusTable: String, rejectTable: String,
          checkpoint: String): (Long, Long) = {
    val accepted = spark.sparkContext.longAccumulator("corpus_accepted")
    val rejected = spark.sparkContext.longAccumulator("corpus_rejected")
    val fn: (Dataset[Row], Long) => Unit = (batch, _) => {
      val derived = withDerived(batch).localCheckpoint(true) // one scan, two consumers
      val bad = derived.filter(col("quality") =!= "ok")
        .select(col("doc_id"), col("fp"), col("quality").as("reject_reason"))
      val ok = derived.filter(col("quality") === "ok")
        .select(col("doc_id"), col("fp"), col("norm_text"), col("lang"), col("source"))
        .dropDuplicates("fp")
      val fresh =
        if (wh.exists(corpusTable))
          ok.join(wh.read(corpusTable).select("fp"), Seq("fp"), "left_anti")
        else ok
      val freshMat = fresh.localCheckpoint(true)
      wh.append(corpusTable, freshMat)
      wh.append(rejectTable, bad)
      accepted.add(freshMat.count())
      rejected.add(bad.count())
    }
    val q = spark.readStream.schema(schema).parquet(sourceGlob)
      .writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (accepted.value, rejected.value)
  }
}
