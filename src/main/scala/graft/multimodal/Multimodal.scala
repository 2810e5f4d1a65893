package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode/feature/resize/
  * frame-sample operators.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape,
  * operator signatures — is real and tested. The codec step itself is a
  * clearly-marked DETERMINISTIC STUB (this environment ships no image/audio
  * libraries): `stubDecode` derives pseudo-features from the bytes' hash, so
  * outputs are reproducible and the pipeline is swappable to a real codec by
  * replacing one function.
  *
  * Scale notes: media rows are large (MBs); operators repartition by media_id
  * so one task never holds more than `spark.sql.files.maxPartitionBytes` of
  * payload, and feature extraction happens in `mapPartitions` batches (the
  * Scala analog of mapInPandas batches) to amortize per-row setup.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** A media table row: id, kind (image|audio|video), payload, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", mediaMetaSchema)))

  val featureDim = 16

  /** ==== DETERMINISTIC STUB ==== real deployments replace this with an
    * actual codec (JPEG decode, PCM resample, H.264 frame extraction). The
    * stub maps payload bytes -> pseudo feature vector via xxhash64 chaining,
    * so it is a pure, reproducible function of the payload.
    */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val base = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    Array.tabulate(featureDim) { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(base, i.toLong)
      (java.lang.Math.floorMod(h, 2001L) - 1000L).toFloat / 1000.0f
    }
  }

  /** Feature extraction over the media table: per-partition batching via
    * mapPartitions (one decoder init per task, not per row — the pattern a
    * real codec needs).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select("media_id", "kind", "bytes").rdd.mapPartitions { rows =>
      // real codec: initialize decoder context once per partition here
      rows.map { r =>
        val feats = stubDecodeFeatures(r.getAs[Array[Byte]]("bytes"))
        Row(r.getLong(0), r.getString(1), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize: metadata transform + stub payload rewrite (deterministic bytes
    * derived from (payload, w, h)); keeps schema/partitioning identical so a
    * real resampler drops in.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeBytes = udf { (bytes: Array[Byte]) =>
      // ==== STUB ==== real: decode -> scale -> re-encode
      val seed = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, (w.toLong << 32) | h.toLong)
      val out = new Array[Byte](64)
      var i = 0
      while (i < out.length) { out(i) = ((seed >>> (i % 8 * 8)) & 0xff).toByte; i += 1 }
      out
    }
    media
      .withColumn("bytes", resizeBytes(col("bytes")))
      .withColumn("meta", col("meta")
        .withField("width", lit(w))
        .withField("height", lit(h)))
  }

  /** Frame sampling for video rows: emit one descriptor row per sampled
    * frame (posexplode over an evenly-spaced timestamp grid — pure plan,
    * no decode until a downstream operator asks for pixels).
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs)))
          .as(Seq("frame_idx", "frame_ts_ms")))

  /** Build a deterministic synthetic media table from any text corpus (test
    * harness for the plumbing; payload = UTF-8 bytes of the text).
    */
  def syntheticMediaFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kinds = Seq("image", "audio", "video")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(lit(kinds.toArray), (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      struct(
        lit("synthetic").as("format"),
        lit(640).as("width"), lit(480).as("height"),
        (pmod(col(idCol), lit(10)) * 1000).cast("long").as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))
  }
}
