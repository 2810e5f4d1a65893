package graft.multimodal

import graft.SparkSpec

class CodecsSpec extends SparkSpec {

  test("PPM: encode/decode round-trip, comments and whitespace in header") {
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 17 % 256).toByte)
    val enc = Codecs.encodePpm(2, 3, rgb)
    val (w, h, out) = Codecs.decodePpm(enc)
    assert(w === 2 && h === 3 && out.toSeq === rgb.toSeq)
    // header with comments + CRLF-ish whitespace is legal PPM
    val commented = ("P6\n# a comment\n2 # trailing\n\t3\r\n255\n").getBytes("US-ASCII") ++ rgb
    val (w2, h2, out2) = Codecs.decodePpm(commented)
    assert(w2 === 2 && h2 === 3 && out2.toSeq === rgb.toSeq)
  }

  test("PPM: truncated raster and bad magic are rejected loudly") {
    val rgb = Array.fill(12)(1.toByte)
    val enc = Codecs.encodePpm(2, 2, rgb)
    intercept[IllegalArgumentException] { Codecs.decodePpm(enc.dropRight(1)) }
    intercept[IllegalArgumentException] { Codecs.decodePpm("P5\n1 1\n255\nx".getBytes) }
  }

  test("PPM: nearest-neighbor resize doubles a 2x2 checkerboard exactly") {
    // 2x2: R G / B W
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val out = Codecs.resizePpm(Codecs.encodePpm(2, 2, px), 4, 4)
    val (w, h, rgb) = Codecs.decodePpm(out)
    assert(w === 4 && h === 4)
    def pix(x: Int, y: Int) = (rgb((y * 4 + x) * 3) & 0xff, rgb((y * 4 + x) * 3 + 1) & 0xff, rgb((y * 4 + x) * 3 + 2) & 0xff)
    // each source pixel becomes a 2x2 block
    assert(pix(0, 0) === ((255, 0, 0)) && pix(1, 1) === ((255, 0, 0)))
    assert(pix(2, 0) === ((0, 255, 0)) && pix(3, 1) === ((0, 255, 0)))
    assert(pix(0, 2) === ((0, 0, 255)) && pix(1, 3) === ((0, 0, 255)))
    assert(pix(2, 2) === ((255, 255, 255)) && pix(3, 3) === ((255, 255, 255)))
  }

  test("PNG: encode/decode round-trip exercises all five filters") {
    // 7 rows: the encoder cycles filters y % 5, so rows 0-4 cover
    // None/Sub/Up/Average/Paeth and rows 5-6 re-enter the cycle
    val w = 5; val h = 7
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val enc = Codecs.encodePng(w, h, rgb)
    assert(Codecs.isPng(enc))
    val (w2, h2, out) = Codecs.decodePng(enc)
    assert(w2 === w && h2 === h && out.toSeq === rgb.toSeq)
    val (n, r, g, b) = Codecs.pngChannelSums(enc)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (i <- 0 until w * h) {
      er += rgb(3 * i) & 0xff; eg += rgb(3 * i + 1) & 0xff; eb += rgb(3 * i + 2) & 0xff
    }
    assert(n === w * h && r === er && g === eg && b === eb)
  }

  test("PNG: corrupt CRC, bad signature, truncated stream are rejected loudly") {
    val enc = Codecs.encodePng(4, 4, Array.fill(48)(9.toByte))
    // flip a byte inside IDAT data: chunk CRC must catch it
    val tampered = enc.clone()
    tampered(8 + 12 + 13 + 8 + 2) = (tampered(8 + 12 + 13 + 8 + 2) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException] { Codecs.decodePng(tampered) }
    assert(e1.getMessage.contains("CRC"))
    intercept[IllegalArgumentException] { Codecs.decodePng("nope".getBytes) }
    intercept[IllegalArgumentException] { Codecs.decodePng(enc.dropRight(20)) }
  }

  test("PNG: resize decode→resample→re-encode doubles a 2x2 checkerboard") {
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val out = Codecs.resizePng(Codecs.encodePng(2, 2, px), 4, 4)
    val (w, h, rgb) = Codecs.decodePng(out)
    assert(w === 4 && h === 4)
    def pix(x: Int, y: Int) = (rgb((y * 4 + x) * 3) & 0xff, rgb((y * 4 + x) * 3 + 1) & 0xff, rgb((y * 4 + x) * 3 + 2) & 0xff)
    assert(pix(0, 0) === ((255, 0, 0)) && pix(3, 3) === ((255, 255, 255)))
    assert(pix(2, 0) === ((0, 255, 0)) && pix(0, 2) === ((0, 0, 255)))
  }

  test("WAV: encode/decode round-trip and chunk walking past foreign chunks") {
    val samples = Array.tabulate(100)(i => ((i * 997) % 2001 - 1000).toShort)
    val enc = Codecs.encodeWavPcm16(16000, samples)
    val (rate, out) = Codecs.decodeWavPcm16(enc)
    assert(rate === 16000 && out.toSeq === samples.toSeq)
    // splice a LIST chunk between fmt and data — decoder must skip it
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = enc.take(36) ++ listChunk ++ enc.drop(36)
    // fix RIFF size field (bytes 4-7, little endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate2, out2) = Codecs.decodeWavPcm16(spliced)
    assert(rate2 === 16000 && out2.toSeq === samples.toSeq)
  }

  test("wavStats: sumSq and zero crossings match a direct computation") {
    val samples = Array[Short](5, -3, -1, 0, 2, -2)
    val (n, sumSq, zc) = Codecs.wavStats(Codecs.encodeWavPcm16(8000, samples))
    assert(n === 6)
    assert(sumSq === (25 + 9 + 1 + 0 + 4 + 4).toLong)
    assert(zc === 3L) // 5->-3, -1->0, 2->-2
  }

  test("extractFeatures dispatches real formats to the real decoder") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documentsLimit(spark, sfDir, 10)
    val ppm = Multimodal.syntheticPpmFromIds(docs, "doc_id")
    val feats = Multimodal.extractFeatures(ppm)
      .select(col("media_id"), element_at(col("features"), 1).as("w"),
        element_at(col("features"), 3).as("n_px"))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      assert(r.getFloat(1) === 8.0f, "feature[0] must be the REAL decoded width")
      assert(r.getFloat(2) === 64.0f, "feature[2] must be the REAL pixel count")
    }
  }

  test("G.711: expansion matches the public reference values") {
    def ulaw(code: Int): Int = {
      val (_, _, s) = Codecs.decodeWavAny(Codecs.encodeWavG711(8000, Array(code.toByte), mulaw = true))
      s.head.toInt
    }
    def alaw(code: Int): Int = {
      val (_, _, s) = Codecs.decodeWavAny(Codecs.encodeWavG711(8000, Array(code.toByte), mulaw = false))
      s.head.toInt
    }
    // μ-law: 0xFF/0x7F are ±0; 0x00 is the negative extreme -32124
    assert(ulaw(0xff) === 0 && ulaw(0x7f) === 0)
    assert(ulaw(0x00) === -32124 && ulaw(0x80) === 32124)
    // A-law: 0x55 -> -8 (segment 0), 0xD5 -> +8; 0x2A -> -32256 extreme
    assert(alaw(0x55) === -8 && alaw(0xd5) === 8)
    assert(alaw(0x2a) === -32256 && alaw(0xaa) === 32256)
    // both decoders are odd-symmetric in the sign bit (up to μ-law's ±0)
    for (c <- 0 until 128) {
      assert(ulaw(c) === -ulaw(c | 0x80))
      assert(alaw(c ^ 0x80) === -alaw(c))
    }
  }

  test("G.711: decodeWavAny reports format codes; PCM16 passthrough unchanged") {
    val pcm = Codecs.encodeWavPcm16(16000, Array[Short](5, -5, 100))
    val (f1, r1, s1) = Codecs.decodeWavAny(pcm)
    assert(f1 === 1 && r1 === 16000 && s1.toSeq === Seq[Short](5, -5, 100))
    val (f7, _, _) = Codecs.decodeWavAny(Codecs.encodeWavG711(8000, Array[Byte](1, 2, 3), mulaw = true))
    val (f6, _, _) = Codecs.decodeWavAny(Codecs.encodeWavG711(8000, Array[Byte](1, 2, 3), mulaw = false))
    assert(f7 === 7 && f6 === 6)
    // odd-length data chunk stays word-aligned and exact
    val (_, _, s) = Codecs.decodeWavAny(Codecs.encodeWavG711(8000, Array[Byte](0x55), mulaw = false))
    assert(s.toSeq === Seq[Short](-8))
  }

  private object Tables {
    def documentsLimit(s: org.apache.spark.sql.SparkSession, dir: String, n: Int) =
      graft.Tables.documents(s, dir).limit(n)
  }
}
