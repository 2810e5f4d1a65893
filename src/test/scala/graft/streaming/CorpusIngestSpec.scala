package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.io.Warehouse

class CorpusIngestSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("composed ingestion: quality gate + dedup + quarantine, idempotent across drains") {
    val root = java.nio.file.Files.createTempDirectory("corpus_ingest").toString
    val wh = new Warehouse(spark, s"$root/wh")
    val ck1 = s"$root/ck1"

    val (acc1, rej1) = CorpusIngest.run(spark, s"$sfDir/documents.parq*", docSchema,
      wh, "corpus", "rejects", ck1)
    assert(acc1 > 0, "some documents must pass the gate")

    val corpus = wh.read("corpus")
    // fingerprints unique (dedup held) and only 'ok'-quality rows landed
    assert(corpus.count() === corpus.select("fp").distinct().count())
    assert(acc1 === corpus.count())
    assert(rej1 === wh.read("rejects").count())

    // reject counts agree with the batch-computed ground truth
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val truthRejects = Tables.documents(spark, sfDir)
      .withColumn("q", graft.text.TextOps.qualityBucket(norm))
      .filter(col("q") =!= "ok").count()
    assert(rej1 === truthRejects)

    // same checkpoint, second drain: files already absorbed — nothing moves
    val (acc2, rej2) = CorpusIngest.run(spark, s"$sfDir/documents.parq*", docSchema,
      wh, "corpus", "rejects", ck1)
    assert(acc2 === 0L && rej2 === 0L)
    assert(wh.read("corpus").count() === acc1)

    // FRESH checkpoint (simulated re-delivery): the fingerprint anti-join
    // absorbs every duplicate — corpus unchanged, rejects re-append (they
    // carry no key; dedup them downstream by fp if needed)
    val (acc3, _) = CorpusIngest.run(spark, s"$sfDir/documents.parq*", docSchema,
      wh, "corpus", "rejects", s"$root/ck2")
    assert(acc3 === 0L)
    assert(wh.read("corpus").count() === acc1)
  }
}
