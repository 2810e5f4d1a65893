package graft.multimodal

import graft.SparkSpec

class GifSpec extends SparkSpec {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def grayPalette(n: Int): Array[Int] =
    Array.tabulate(n)(j => (j << 16) | (j << 8) | j)

  test("LZW: encode/decode round-trip across palette sizes and entropies") {
    for {
      minCode <- Seq(2, 4, 8)
      (name, gen) <- Seq[(String, Int => Byte)](
        ("random", i => (rng(minCode * 1000 + i).nextInt(1 << minCode)).toByte),
        ("constant", _ => 3.toByte),          // deep dictionary chains (KwKwK)
        ("ramp", i => (i % (1 << minCode)).toByte))
      n <- Seq(7, 64 * 64) // tiny + big enough to force width growth
    } {
      val idx = Array.tabulate(n)(gen)
      val dec = Gif.lzwDecode(minCode, Gif.lzwEncode(minCode, idx), n)
      assert(dec.toSeq === idx.toSeq, s"minCode=$minCode $name n=$n")
    }
  }

  test("LZW: dictionary overflow (4096 entries) forces clear + reset, still exact") {
    // low-entropy long raster: dictionary fills past 4096 and the encoder
    // must emit CLEAR mid-stream; 256-color => widths walk 9..12 first
    val n = 200000
    val idx = Array.tabulate(n)(i => ((i * i + i / 7) % 256).toByte)
    val enc = Gif.lzwEncode(8, idx)
    assert(Gif.lzwDecode(8, enc, n).toSeq === idx.toSeq)
  }

  test("LZW: decoder handles an INDEPENDENT clear-spam encoder's stream") {
    // lzwEncodeClearSpam emits only literal codes + mid-stream CLEARs — a
    // second, trivially-spec-correct code stream, so decode conformance is
    // not just round-trip self-consistency
    for (minCode <- Seq(2, 4, 8)) {
      val n = 4097
      val idx = Array.tabulate(n)(i => (rng(minCode + i).nextInt(1 << minCode)).toByte)
      val enc = Gif.lzwEncodeClearSpam(minCode, idx)
      assert(Gif.lzwDecode(minCode, enc, n).toSeq === idx.toSeq, s"minCode=$minCode")
    }
  }

  test("container: single-frame round-trip, magic, palette lookup") {
    val idx = Array.tabulate(64)(i => (i * 5 % 16).toByte)
    val pal = Array.tabulate(16)(j => (j << 16) | ((j * 2) << 8) | (j * 3))
    val bytes = Gif.encode(8, 8, pal, Seq(Gif.EncFrame(0, 0, 8, 8, delayCs = 7, indices = idx)))
    assert(Gif.isGif(bytes))
    val (cw, ch, frames) = Gif.decodeRgbFrames(bytes)
    assert(cw === 8 && ch === 8 && frames.size === 1 && frames.head._1 === 7)
    val rgb = frames.head._2
    for (i <- 0 until 64) {
      val j = idx(i) & 0xff
      assert((rgb(i * 3) & 0xff) === j && (rgb(i * 3 + 1) & 0xff) === j * 2 &&
        (rgb(i * 3 + 2) & 0xff) === j * 3, s"pixel $i")
    }
  }

  test("container: interlaced frame decodes identically to sequential") {
    val idx = Array.tabulate(16 * 11)(i => (i % 256).toByte) // h=11: uneven passes
    val pal = grayPalette(256)
    val plain = Gif.encode(16, 11, pal, Seq(Gif.EncFrame(0, 0, 16, 11, 0, indices = idx)))
    val laced = Gif.encode(16, 11, pal,
      Seq(Gif.EncFrame(0, 0, 16, 11, 0, interlaced = true, indices = idx)))
    assert(laced.toSeq !== plain.toSeq) // rows really were reordered on disk
    val a = Gif.decodeRgbFrames(plain)._3.head._2
    val b = Gif.decodeRgbFrames(laced)._3.head._2
    assert(a.toSeq === b.toSeq)
  }

  test("container: sub-rect frames composite over the canvas; transparency punches through") {
    val pal = grayPalette(256)
    // frame 0: full 4x4 canvas of 10s; frame 1: 2x2 patch of 200s at (1,1)
    // with one transparent pixel (index 7) that must SHOW the 10 beneath
    val f0 = Gif.EncFrame(0, 0, 4, 4, 5, indices = Array.fill(16)(10.toByte))
    val patch = Array[Byte](200.toByte, 7, 200.toByte, 200.toByte)
    val f1 = Gif.EncFrame(1, 1, 2, 2, 5, transparentIdx = 7, indices = patch)
    val bytes = Gif.encode(4, 4, pal, Seq(f0, f1), loop = true, comment = Some("graft test"))
    val (_, _, frames) = Gif.decodeRgbFrames(bytes)
    assert(frames.size === 2)
    def lum(rgb: Array[Byte], x: Int, y: Int) = rgb((y * 4 + x) * 3) & 0xff
    val c1 = frames(1)._2
    assert(lum(c1, 1, 1) === 200) // patch drawn
    assert(lum(c1, 2, 1) === 10)  // transparent pixel: frame-0 value survives
    assert(lum(c1, 1, 2) === 200 && lum(c1, 2, 2) === 200)
    assert(lum(c1, 0, 0) === 10 && lum(c1, 3, 3) === 10) // outside patch
  }

  test("container: disposal restore-background and restore-previous") {
    // palette: 0 = background (value 99 so it is visible), 1..n gray
    val pal = grayPalette(256).updated(0, (99 << 16) | (99 << 8) | 99)
    val full = Gif.EncFrame(0, 0, 4, 4, 1, disposal = 1, indices = Array.fill(16)(50.toByte))
    val patch2 = Gif.EncFrame(0, 0, 2, 2, 1, disposal = 2, indices = Array.fill(4)(150.toByte))
    val patch3 = Gif.EncFrame(1, 1, 2, 2, 1, disposal = 3, indices = Array.fill(4)(250.toByte))
    val last = Gif.EncFrame(0, 0, 1, 1, 1, disposal = 1, indices = Array[Byte](60))
    val bytes = Gif.encode(4, 4, pal, Seq(full, patch2, patch3, last))
    val (_, _, frames) = Gif.decodeRgbFrames(bytes)
    def lum(i: Int, x: Int, y: Int) = frames(i)._2((y * 4 + x) * 3) & 0xff
    assert(lum(1, 0, 0) === 150)  // patch2 visible in its own frame
    // after patch2 (disposal=2) its rect restores to BACKGROUND (pal 0 = 99)
    assert(lum(2, 0, 0) === 99 && lum(2, 1, 1) === 250)
    // after patch3 (disposal=3) the canvas restores to pre-patch3: (1,1) is
    // inside patch2's bg-restored rect so it returns to 99 (not 250, not 50);
    // (2,2) was painted 250 by patch3 but restores to frame-0's 50
    assert(lum(3, 0, 0) === 60 && lum(3, 1, 1) === 99 && lum(3, 2, 2) === 50)
  }

  test("frameStats: delays accumulate into presentation timestamps; weighted sum sees row order") {
    val pal = grayPalette(256)
    val mk = (v: Int, d: Int) => Gif.EncFrame(0, 0, 4, 2, d, indices = Array.fill(8)(v.toByte))
    val bytes = Gif.encode(4, 2, pal, Seq(mk(1, 3), mk(2, 5), mk(3, 0)))
    val stats = Gif.frameStats(bytes)
    assert(stats.map(_._1) === Seq(0, 1, 2))
    assert(stats.map(_._2) === Seq(0L, 30L, 80L)) // 10ms * cumulative cs
    assert(stats.map(_._4) === Seq(8L, 16L, 24L)) // sum_r = 8 * v
    // weighted: v * sum(1..8) = 36v
    assert(stats.map(_._7) === Seq(36L, 72L, 108L))
    // row-order sensitivity: two frames with the same multiset of pixels but
    // swapped rows must differ in wsum, not in sum
    val rows = Array.tabulate(8)(i => (if (i < 4) 9 else 17).toByte)
    val swap = Array.tabulate(8)(i => (if (i < 4) 17 else 9).toByte)
    val sA = Gif.frameStats(Gif.encode(4, 2, pal, Seq(Gif.EncFrame(0, 0, 4, 2, 0, indices = rows)))).head
    val sB = Gif.frameStats(Gif.encode(4, 2, pal, Seq(Gif.EncFrame(0, 0, 4, 2, 0, indices = swap)))).head
    assert(sA._4 === sB._4 && sA._7 != sB._7)
  }

  test("resize: animated NN downscale preserves palette, timing, frame count") {
    val pal = grayPalette(256)
    // 8x8 with left half 40, right half 90 → 4x4 keeps the halves
    val idx = Array.tabulate(64)(i => (if (i % 8 < 4) 40 else 90).toByte)
    val f = Seq(Gif.EncFrame(0, 0, 8, 8, 4, indices = idx),
      Gif.EncFrame(0, 0, 8, 8, 6, indices = idx.map(b => (b + 10).toByte)))
    val out = Gif.resize(Gif.encode(8, 8, pal, f), 4, 4)
    val (cw, ch, frames) = Gif.decodeRgbFrames(out)
    assert(cw === 4 && ch === 4 && frames.size === 2)
    assert(frames.map(_._1) === Seq(4, 6))
    val rgb = frames.head._2
    assert((rgb(0) & 0xff) === 40 && (rgb(3 * 3) & 0xff) === 90)
    val rgb2 = frames(1)._2
    assert((rgb2(0) & 0xff) === 50 && (rgb2(3 * 3) & 0xff) === 100)
  }

  test("malformed streams are rejected loudly") {
    intercept[IllegalArgumentException] { Gif.decodeFrames("GIF10a".getBytes) }
    val pal = grayPalette(4)
    val ok = Gif.encode(2, 2, pal, Seq(Gif.EncFrame(0, 0, 2, 2, 0, indices = Array[Byte](0, 1, 2, 3))))
    // truncate mid-stream: raster comes up short
    intercept[IllegalArgumentException] { Gif.decodeFrames(ok.dropRight(6)) }
  }
}
