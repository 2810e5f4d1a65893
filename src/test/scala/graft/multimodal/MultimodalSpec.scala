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

  test("grayGrid/dhash64/ahash64: reference math, uneven floor blocks, luma weights") {
    // 4x2 raster, 2x2 grid: exact halves. Pixels chosen so luma matters.
    val rgb = Array[Int](
      // row 0: (255,0,0) (0,255,0) | (0,0,255) (255,255,255)
      255,0,0,  0,255,0,  0,0,255,  255,255,255,
      // row 1: all black | all (100,100,100)
      0,0,0,  0,0,0,  100,100,100,  100,100,100).map(_.toByte)
    val g = Multimodal.grayGrid(4, 2, rgb, 2, 1)
    // cell(0,0) = floor((luma(255,0,0)+luma(0,255,0)+0+0)/4) = (76+149)/4 = 56
    // cell(1,0) = floor((luma(0,0,255)+255+100+100)/4) = (29+255+100+100)/4 = 121
    assert(g.toSeq === Seq(56, 121))
    // uneven blocks: width 18 -> 8 cols has boundaries 0,2,4,6,9,11,13,15,18
    // (widths 2,2,2,3,2,2,2,3) - pin a 18x1 gray ramp against hand math
    val ramp = Array.tabulate(18 * 3)(i => (10 * (i / 3)).toByte)
    val g8 = Multimodal.grayGrid(18, 1, ramp, 8, 1)
    assert(g8.toSeq === Seq(5, 25, 45, 70, 95, 115, 135, 160))
    // dhash: bit set iff right cell strictly greater
    val grid9x8 = Array.tabulate(72) { i => val c = i % 9; if (c % 2 == 1) 10 else 0 }
    val dh = Multimodal.dhash64(grid9x8)
    // per row: cells 0,10,0,10,0,10,0,10,0 -> bits c=0,2,4,6 (up-steps)
    val rowBits = Seq(0, 2, 4, 6).map(1L << _).sum
    assert(dh === (0 until 8).map(r => rowBits << (r * 8)).sum)
    // ahash: strict > floor-mean
    val grid8x8 = Array.tabulate(64)(i => if (i < 32) 0 else 101)
    val ah = Multimodal.ahash64(grid8x8) // mean = 50, bits 32..63 set
    assert(ah === (32 until 64).map(1L << _).sum)
  }

  test("near-dup fixture: dHash recovers the closed-form bits through all three containers") {
    val ids = (0L until 164L).toDF("doc_id") // every (class, variant) once
    val m = Multimodal.syntheticNearDupImages(ids, "doc_id")
    val got = Multimodal.perceptualHashes(m)
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    assert(got.size === 164)
    for (id <- 0L until 164L) {
      val (k, v) = (id % 41, (id / 41) % 4)
      var want = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (Multimodal.nearDupBit(k, v, r, c)) want |= 1L << (r * 8 + c)
      assert(got(id) === want, s"id=$id (k=$k v=$v, container=${id % 3})")
    }
  }

  test("perceptual hashes survive a lossy JPEG round-trip: PNG and JPEG of one picture cluster together") {
    // A picture with strong block structure (gray steps of +-32): encode the
    // SAME raster as lossless PNG and as lossy baseline JPEG. Exact digests
    // differ (JPEG decodes to a different raster), but dHash must land the
    // pair within the Hamming-3 near-dup threshold - the cross-format pair
    // the perceptual family exists for.
    val w = 18; val h = 16
    val grid = Array.tabulate(8, 9) { (r, c) =>
      128 + 32 * (if (((r * 9 + c) * 2654435761L >>> (r + c)) % 2 == 0) 1 else -1)
    }
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val g = grid(y / 2)(x / 2).toByte
      val p = 3 * (y * w + x)
      rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
    }
    val png = Codecs.encodePng(w, h, rgb)
    val jpg = Jpeg.encodeRgb444(w, h, rgb)
    val pair = Seq((1L, png), (2L, jpg)).toDF("media_id", "bytes")
    val hs = Multimodal.perceptualHashes(pair)
      .select("media_id", "dhash").as[(Long, Long)].collect().toMap
    val dist = java.lang.Long.bitCount(hs(1L) ^ hs(2L))
    assert(dist <= 3, s"PNG vs JPEG dHash Hamming distance $dist exceeds the near-dup threshold")
    // and the decoded rasters DO differ (the round-trip is genuinely lossy;
    // decodedPixelDigest deliberately skips JPEG, so compare pixels directly)
    val (dw, dh, decoded) = Jpeg.decode(jpg)
    assert((dw, dh) === ((w, h)))
    assert(decoded.toSeq !== rgb.toSeq, "JPEG round-trip unexpectedly lossless - the spec proves nothing")
  }
}
