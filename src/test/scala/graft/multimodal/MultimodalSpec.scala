package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(30)
  private lazy val media = Multimodal.syntheticMediaFromDocs(docs, "doc_id", "text")

  test("media table schema: binary payload + typed metadata struct") {
    assert(media.schema("bytes").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("format", "width", "height", "duration_ms", "sample_rate"))
    assert(media.count() === 30)
  }

  test("feature extraction: fixed dim, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id")
      .select("features").as[Seq[Float]].collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id")
      .select("features").as[Seq[Float]].collect()
    assert(f1.length === 30)
    assert(f1.forall(_.length === Multimodal.featureDim))
    assert(f1.toSeq === f2.toSeq)
  }

  test("resize rewrites payload deterministically and updates metadata") {
    val r = Multimodal.resize(media, 128, 128)
    val meta = r.select("meta.width", "meta.height").distinct().head()
    assert((meta.getInt(0), meta.getInt(1)) === ((128, 128)))
    val b1 = r.orderBy("media_id").select("bytes").as[Array[Byte]].first()
    val b2 = Multimodal.resize(media, 128, 128).orderBy("media_id")
      .select("bytes").as[Array[Byte]].first()
    assert(b1.toSeq === b2.toSeq)
    assert(b1.length === 64)
  }

  test("GIF dispatch: features, frame stats sampling, and real resize") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(6)
    val media = Multimodal.syntheticGifFromIds(docs, "doc_id")
    // every payload is a real GIF and the feature path reports 4 frames
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f(0) === 8.0f && f(1) === 8.0f && f(6) === 4.0f, "w/h/frames")
    }
    // sampleEvery=2 keeps exactly frames 0 and 2
    val sampled = Multimodal.gifFrameStats(media, sampleEvery = 2)
    val perDoc = sampled.groupBy("media_id").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) === 2L))
    assert(sampled.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted.toSeq === Seq(0, 2))
    // real resize: downscale to 4x4, still a decodable 4-frame GIF
    val rz = Multimodal.resize(media, 4, 4)
    val stats = Multimodal.gifFrameStats(rz).groupBy("media_id").count().collect()
    assert(stats.forall(_.getLong(1) === 4L))
    assert(rz.select("meta.width").head().getInt(0) === 4)
  }

  test("frame sampling explodes only video rows on the duration grid") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
    val kinds = media.filter($"kind" === "video").count()
    assert(frames.count() >= kinds) // >=1 frame per video row
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_ts_ms"))
    val nonVideo = media.filter($"kind" =!= "video").select("media_id").as[Long].collect().toSet
    assert(frames.filter($"media_id".isin(nonVideo.toSeq: _*)).count() === 0)
  }
}
