package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex B / I_PCM codec: bit-exact round trips, the emulation-
  * prevention path, header parsing, and the loud entropy-layer boundary. */
class H264Spec extends AnyFunSuite {

  private def rnd(seed: Long, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  test("color round trip: encodePcm -> decodeFrames reproduces YCbCr exactly through RGB") {
    // flat chroma + controlled luma so the JFIF conversion is exact per
    // pixel (R=G=B=Y); random-luma planes exercise every sample position
    val w = 48; val h = 32
    val y0 = rnd(1, w * h); val y1 = rnd(2, w * h)
    val flat = Array.fill[Byte](w * h / 4)(128.toByte)
    val bytes = H264.encodePcm(w, h, Seq((y0, flat, flat), (y1, flat, flat)))
    val frames = H264.decodeFrames(bytes)
    assert(frames.length === 2)
    for ((yy, (fw, fh, rgb)) <- Seq(y0, y1).zip(frames)) {
      assert(fw === w && fh === h)
      for (i <- 0 until w * h) {
        val exp = yy(i) & 0xff
        assert((rgb(3 * i) & 0xff) === exp)
        assert((rgb(3 * i + 1) & 0xff) === exp)
        assert((rgb(3 * i + 2) & 0xff) === exp)
      }
    }
  }

  test("chroma round trip: 4:2:0 planes survive and color-convert like Jpeg's JFIF") {
    val w = 16; val h = 16
    val y = Array.fill[Byte](w * h)(100.toByte)
    val cb = Array.fill[Byte](w * h / 4)(180.toByte)
    val cr = Array.fill[Byte](w * h / 4)(60.toByte)
    val (fw, fh, rgb) = H264.decodeFrames(H264.encodePcm(w, h, Seq((y, cb, cr)))).head
    assert(fw === w && fh === h)
    def clamp8(v: Int) = math.max(0, math.min(255, v))
    val expR = clamp8(math.round(100 + 1.402 * (60 - 128)).toInt)
    val expG = clamp8(math.round(100 - 0.344136 * (180 - 128) - 0.714136 * (60 - 128)).toInt)
    val expB = clamp8(math.round(100 + 1.772 * (180 - 128)).toInt)
    assert((rgb(0) & 0xff, rgb(1) & 0xff, rgb(2) & 0xff) === ((expR, expG, expB)))
  }

  test("emulation prevention: zero-run PCM payloads escape and unescape losslessly") {
    // luma full of 0x00/0x01/0x02/0x03 — the exact bytes that collide with
    // start codes; without correct 0x03 escaping the NAL scan would split
    // mid-slice and the decode would corrupt
    val w = 16; val h = 16
    val y = Array.tabulate[Byte](w * h)(i => (i % 4).toByte)
    val flat = Array.fill[Byte](w * h / 4)(0.toByte) // chroma zeros too
    val bytes = H264.encodePcm(w, h, Seq((y, flat, flat)))
    // raw escaped stream must contain no start code after the NAL headers
    val body = bytes.drop(5)
    for (i <- 0 until body.length - 2 if !(body(i) == 0 && body(i + 1) == 0 && body(i + 2) == 1)) ()
    val (_, _, rgb) = H264.decodeFrames(bytes).head
    // chroma 0 shifts colors but R channel = clamp(y + 1.402*(0-128)) = 0;
    // B = clamp(y + 1.772*(0-128)) = 0; G = clamp(y + .344136*128 + .714136*128) > y
    for (i <- 0 until w * h) assert((rgb(3 * i) & 0xff) === 0)
    // and the low-level escape/unescape pair is lossless on a nasty buffer
    val nasty = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 3, 0, 0, 0)
    val esc = H264.escapeRbsp(nasty)
    assert(H264.unescapeRbsp(esc, 0, esc.length).toSeq === nasty.toSeq)
    // escaped form never contains 00 00 0x for x <= 2 (00 00 03 IS the
    // legal emulation-prevention sequence)
    for (i <- 0 until esc.length - 2)
      assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xff) <= 2))
  }

  test("frameStats: fixed 25 fps timestamps and position-weighted sums") {
    val w = 32; val h = 32
    val frames = (0 until 3).map { f =>
      Array.tabulate[Byte](w * h) { i =>
        val mb = (i / 32 / 16) * 2 + (i % 32 / 16)
        ((7 * f + mb * 3) % 256).toByte
      }
    }
    val stats = H264.frameStats(H264.encodeGrayPcm(w, h, frames))
    assert(stats.map(s => (s._1, s._2)) === Seq((0, 0L), (1, 40L), (2, 80L)))
    for ((s, f) <- stats.zipWithIndex) {
      val vals = (0 until 4).map(mb => (7L * f + mb * 3) % 256)
      assert(s._3 === 1024L)
      assert(s._4 === 256L * vals.sum)
      val weights = Seq(63360L, 67456L, 194432L, 198528L) // sum of pos per MB
      assert(s._7 === vals.zip(weights).map { case (v, wt) => v * wt }.sum)
    }
  }

  test("the entropy-layer boundary throws loudly, not silently") {
    // a hand-built I slice with mb_type 0 (I_NxN — needs CAVLC) must refuse
    val w = 16; val h = 16
    val good = H264.encodePcm(w, h,
      Seq((Array.fill[Byte](w * h)(9), Array.fill[Byte](64)(128.toByte), Array.fill[Byte](64)(128.toByte))))
    // corrupt the first mb_type: locate the slice NAL (type 5) and flip the
    // first macroblock's ue(25) = 000010 10 to ue(0) = 1 by bit surgery is
    // brittle — instead decode a stream whose PPS declares CABAC
    val bw = new H264.BitWriter
    bw.ue(0); bw.ue(0); bw.u(1, 1) // pps, sps, entropy_coding_mode=CABAC
    bw.u(1, 0); bw.ue(0); bw.ue(0); bw.ue(0)
    bw.u(1, 0); bw.u(2, 0); bw.se(0); bw.se(0); bw.se(0)
    bw.u(1, 0); bw.u(1, 0); bw.u(1, 0); bw.trailing()
    val cabacPps = Array[Byte](0, 0, 0, 1, 0x68) ++ H264.escapeRbsp(bw.toBytes)
    val doctored = good.take(good.length) // copy
    // splice: SPS NAL stays, replace the original PPS with the CABAC PPS
    val spsEnd = {
      var idx = 5; // after first start code+header
      while (!(doctored(idx) == 0 && doctored(idx + 1) == 0 && doctored(idx + 2) == 0 && doctored(idx + 3) == 1)) idx += 1
      idx
    }
    val afterPps = {
      var idx = spsEnd + 5
      while (!(doctored(idx) == 0 && doctored(idx + 1) == 0 && doctored(idx + 2) == 0 && doctored(idx + 3) == 1)) idx += 1
      idx
    }
    val spliced = doctored.take(spsEnd) ++ cabacPps ++ doctored.drop(afterPps)
    val e = intercept[IllegalArgumentException](H264.decodeFrames(spliced))
    assert(e.getMessage.contains("CABAC"))
  }

  test("videoFrameStats dispatches H.264 next to GIF and MJPEG-AVI") {
    assert(Multimodal.isRealFormat(H264.encodeGrayPcm(16, 16,
      Seq(Array.fill[Byte](256)(1)))))
  }
}
