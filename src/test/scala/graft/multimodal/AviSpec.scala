package graft.multimodal

import graft.SparkSpec

class AviSpec extends SparkSpec {

  private def grayFrame(v: Int): Array[Byte] =
    Jpeg.encodeGray(16, 16, Array.fill(256)(v.toByte))

  test("container: MJPEG round-trip preserves frame streams, dims, timing") {
    val frames = Seq(grayFrame(10), grayFrame(130), grayFrame(250))
    val avi = Avi.encodeMjpeg(16, 16, 1, 25, frames)
    assert(Avi.isAvi(avi))
    val (w, h, scale, rate, out) = Avi.decodeMjpeg(avi)
    assert(w === 16 && h === 16 && scale === 1 && rate === 25)
    assert(out.size === 3)
    out.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("container: odd-sized frame chunks stay word-aligned") {
    // JPEG streams can be odd-length; the pad byte must not corrupt the walk
    val f1 = grayFrame(33)
    val odd = if (f1.length % 2 == 0) f1 :+ 0xd9.toByte else f1 // force odd
    assert(odd.length % 2 === 1)
    val avi = Avi.encodeMjpeg(16, 16, 1, 10, Seq(odd, grayFrame(77)))
    val (_, _, _, _, out) = Avi.decodeMjpeg(avi)
    assert(out.size === 2 && out.head.toSeq === odd.toSeq)
  }

  test("frameStats: per-frame decode + scale/rate presentation timestamps") {
    // uniform frames are bit-exact through the JPEG pipeline (q184 contract)
    val avi = Avi.encodeMjpeg(16, 16, 1, 20, Seq(grayFrame(10), grayFrame(20), grayFrame(30)))
    val stats = Avi.frameStats(avi)
    assert(stats.map(_._1) === Seq(0, 1, 2))
    assert(stats.map(_._2) === Seq(0L, 50L, 100L)) // 1000*scale/rate
    assert(stats.map(_._3) === Seq(256L, 256L, 256L))
    assert(stats.map(_._4) === Seq(2560L, 5120L, 7680L)) // 256 * v
    // gray: all channels equal; weighted sum = v * sum(1..256) = v * 32896
    assert(stats.map(_._5) === stats.map(_._4) && stats.map(_._6) === stats.map(_._4))
    assert(stats.map(_._7) === Seq(10L * 32896, 20L * 32896, 30L * 32896))
    // non-integer rational timing: 3 fps -> floor-ms timestamps
    val s3 = Avi.frameStats(Avi.encodeMjpeg(16, 16, 1, 3, Seq(grayFrame(1), grayFrame(2))))
    assert(s3.map(_._2) === Seq(0L, 333L))
  }

  test("malformed containers are rejected loudly") {
    intercept[IllegalArgumentException] { Avi.decodeMjpeg("RIFFxxxxWAVE".getBytes) }
    val avi = Avi.encodeMjpeg(16, 16, 1, 10, Seq(grayFrame(5)))
    // corrupt the stream handler 'MJPG' -> 'H264': must fail, not mis-decode
    val idx = avi.indexOfSlice("MJPG".getBytes.toSeq)
    assert(idx > 0)
    val hacked = avi.clone()
    "H264".getBytes.zipWithIndex.foreach { case (b, i) => hacked(idx + i) = b }
    intercept[IllegalArgumentException] { Avi.decodeMjpeg(hacked) }
    // truncation inside movi: chunk overruns its list
    intercept[IllegalArgumentException] { Avi.decodeMjpeg(avi.dropRight(30)) }
  }

  test("Multimodal dispatch: videoFrameStats mixes GIF and AVI; features see fps") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(8)
    val avi = Multimodal.syntheticAviFromIds(docs, "doc_id")
    val feats = Multimodal.extractFeatures(avi).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f(0) === 16.0f && f(6) === 3.0f, "w/frames")
    }
    // a mixed GIF+AVI table (disjoint ids): one pass covers both formats
    import org.apache.spark.sql.functions.col
    val gif = Multimodal.syntheticGifFromIds(docs, "doc_id")
    val mixed = avi.filter(col("media_id") % 2 === 0)
      .unionByName(gif.filter(col("media_id") % 2 === 1))
    val counts = Multimodal.videoFrameStats(mixed).groupBy("media_id").count().collect()
    assert(counts.nonEmpty && counts.forall { r =>
      if (r.getLong(0) % 2 == 0) r.getLong(1) == 3L else r.getLong(1) == 4L
    })
    // WAV must NOT be claimed by the AVI path (both are RIFF)
    val wav = Multimodal.syntheticWavFromIds(docs, "doc_id")
    assert(Multimodal.videoFrameStats(wav).count() === 0L)
    assert(Multimodal.audioStats(avi).count() === 0L)
  }
}
