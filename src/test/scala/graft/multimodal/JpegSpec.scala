package graft.multimodal

import graft.SparkSpec

class JpegSpec extends SparkSpec {

  test("uniform 8x8 blocks round-trip BIT-EXACTLY through the lossy pipeline") {
    // the q184 exactness contract: DC-only spectra survive DCT+quant(1)+
    // Huffman+IDCT exactly — every possible block value, incl. extremes
    val vals = Array(0, 1, 17, 127, 128, 200, 254, 255)
    val w = 16; val h = 32 // 2x4 block grid
    val gray = new Array[Byte](w * h)
    for (i <- gray.indices) {
      val b = (i / w / 8) * 2 + (i % w / 8)
      gray(i) = vals(b % vals.length).toByte
    }
    val enc = Jpeg.encodeGray(w, h, gray)
    assert(Jpeg.isJpeg(enc))
    val (w2, h2, rgb) = Jpeg.decode(enc)
    assert(w2 === w && h2 === h)
    for (i <- gray.indices) {
      val exp = gray(i) & 0xff
      assert((rgb(3 * i) & 0xff) === exp, s"pixel $i")
      assert((rgb(3 * i + 1) & 0xff) === exp && (rgb(3 * i + 2) & 0xff) === exp)
    }
  }

  test("full-DCT grayscale round-trip: AC path reconstructs within tight bounds") {
    // non-uniform content exercises AC Huffman symbols, ZRL, EOB, and the
    // IDCT; with quant=1 the only loss is coefficient rounding, so the
    // reconstruction must stay within a few counts of the source
    val w = 24; val h = 16
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 13 + y * 31) ^ (x * y)) % 256).toByte
    }
    val (w2, h2, rgb) = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    assert(w2 === w && h2 === h)
    val maxErr = gray.indices.map(i => math.abs((rgb(3 * i) & 0xff) - (gray(i) & 0xff))).max
    assert(maxErr <= 2, s"max reconstruction error $maxErr with all-ones quant")
  }

  test("color 4:4:4 round-trip: interleaved MCUs + YCbCr both ways") {
    val w = 16; val h = 8
    val rgbIn = Array.tabulate(w * h * 3)(i => ((i * 29 + 5) % 256).toByte)
    val (w2, h2, rgbOut) = Jpeg.decode(Jpeg.encodeRgb444(w, h, rgbIn))
    assert(w2 === w && h2 === h)
    val maxErr = rgbIn.indices.map(i => math.abs((rgbOut(i) & 0xff) - (rgbIn(i) & 0xff))).max
    assert(maxErr <= 6, s"max color round-trip error $maxErr (YCbCr rounding both ways)")
  }

  test("non-multiple-of-8 dimensions: edge-replicated encode, cropped decode") {
    val w = 13; val h = 10
    val gray = Array.tabulate(w * h)(i => ((i * 7) % 256).toByte)
    val (w2, h2, rgb) = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    assert(w2 === w && h2 === h)
    val maxErr = gray.indices.map(i => math.abs((rgb(3 * i) & 0xff) - (gray(i) & 0xff))).max
    assert(maxErr <= 2)
  }

  test("unsupported shapes and corrupt streams are rejected loudly, never mis-decoded") {
    val enc = Jpeg.encodeGray(8, 8, Array.fill(64)(50.toByte))
    intercept[IllegalArgumentException] { Jpeg.decode("bogus".getBytes) }
    // progressive: flip SOF0 (0xc0) to SOF2 (0xc2)
    val prog = enc.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e.getMessage.contains("progressive"))
    // truncated entropy stream
    intercept[IllegalArgumentException] { Jpeg.decode(enc.take(24)) }
  }

  test("channelSums matches an independent decode-side computation") {
    val gray = Array.tabulate(256)(i => (i % 256).toByte)
    val enc = Jpeg.encodeGray(16, 16, gray)
    val (n, r, g, b) = Jpeg.channelSums(enc)
    val (_, _, rgb) = Jpeg.decode(enc)
    val expR = rgb.indices.by(3).map(i => (rgb(i) & 0xff).toLong).sum
    assert(n === 256 && r === expR && g === r && b === r)
  }
}
