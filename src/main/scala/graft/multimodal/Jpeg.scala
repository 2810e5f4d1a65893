package graft.multimodal

/** Pure-JVM BASELINE JPEG (ITU-T T.81 sequential DCT, Huffman) — encoder and
  * decoder, no native library and no javax.imageio: marker segments (DQT/
  * DHT/SOF0/SOS), canonical Huffman entropy coding with byte stuffing,
  * zigzag, dequantization, and a double-precision IDCT. This removes JPEG
  * from the multimodal layer's "needs a native decoder" stub list (r4
  * VERDICT missing #3); the stub boundary shrinks to video codecs (H.264).
  *
  * Scope (the dominant baseline shape): 8-bit sequential DCT, grayscale or
  * 3-component YCbCr without chroma subsampling (all sampling factors 1 —
  * 4:4:4). Progressive (SOF2), subsampled (4:2:0), arithmetic-coded, and
  * restart-interval streams are rejected LOUDLY, never mis-decoded.
  *
  * Exactness note (what makes q184 oracle-checkable): JPEG is lossy, but a
  * UNIFORM 8×8 block survives the pipeline bit-exactly — its forward DCT is
  * DC-only (AC sums cancel), DC = 8·(v−128) is integer, the all-ones quant
  * table preserves it, and the IDCT of a DC-only block is the flat value
  * DC/8 (a power-of-two division, exact in binary floating point). So a
  * synthetic image built from uniform blocks has a CLOSED-FORM decode, while
  * the decoder exercising it is the full real pipeline (Huffman, zigzag,
  * dequant, IDCT). The AC path is proven by round-trip specs on non-uniform
  * images (JpegSpec bounds the reconstruction error).
  */
object Jpeg {

  // ------------------------------------------------------------ constants

  /** Zigzag scan order: zigzag(k) = raster index of the k-th scanned coef. */
  private val Zigzag: Array[Int] = Array(
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K standard Huffman tables: (bits per code length 1..16,
    * symbol values). */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---------------------------------------------------------- Huffman enc

  /** Canonical code assignment per T.81 C.2: (symbol → (code, length)). */
  private def buildEncTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len)) {
        table(vals(k) & 0xff) = (code, len); code += 1; k += 1
      }
      code <<= 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var nb = 0
    def write(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
      while (nb >= 8) {
        val b = ((acc >>> (nb - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nb -= 8
      }
    }
    def flush(): Unit = if (nb > 0) { // pad with 1s per spec
      val b = (((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xff).toInt
      out.write(b); if (b == 0xff) out.write(0x00); nb = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** forward 8×8 DCT-II with the JPEG normalization (input level-shifted). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            sum += block(x * 8 + y) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * sum
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            sum += cu * cv * coef(u * 8 + v) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            v += 1
          }
          u += 1
        }
        out(x * 8 + y) = 0.25 * sum
        y += 1
      }
      x += 1
    }
    out
  }

  // --------------------------------------------------------------- encode

  private def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ u16(payload.length + 2) ++ payload

  private def dhtPayload(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] =
    Array(((tc << 4) | th).toByte) ++ (1 to 16).map(l => bits(l).toByte) ++ vals

  /** Encode one component's blocks (already level-shifted pixel planes) into
    * the bit stream; returns the running DC predictor. Quant table is
    * ALL-ONES (documented: maximal fidelity; the exactness contract above). */
  private def encodeBlock(bw: BitWriter, plane: Array[Int], px: Int, py: Int,
                          w: Int, h: Int, prevDc: Int,
                          dcTab: Array[(Int, Int)], acTab: Array[(Int, Int)]): Int = {
    val blk = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val x = math.min(py + i / 8, h - 1) // edge replication padding
      val y = math.min(px + i % 8, w - 1)
      blk(i) = plane(x * w + y) - 128.0
      i += 1
    }
    val coefs = fdct(blk)
    val q = Array.tabulate(64)(k => math.round(coefs(Zigzag(k))).toInt) // quant = 1
    // DC
    val diff = q(0) - prevDc
    val s = category(diff)
    val (dcCode, dcLen) = dcTab(s)
    bw.write(dcCode, dcLen)
    if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    // AC with run-length + EOB/ZRL
    var run = 0; var k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = acTab(0xf0); bw.write(c, l); run -= 16 }
        val sz = category(q(k))
        val (c, l) = acTab((run << 4) | sz)
        bw.write(c, l)
        bw.write(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acTab(0x00); bw.write(c, l) } // EOB
    q(0)
  }

  private def headerSegments(w: Int, h: Int, nComp: Int): Array[Byte] = {
    val dqt = segment(0xdb, Array(0x00.toByte) ++ Array.fill(64)(1.toByte)) ++
      (if (nComp == 3) segment(0xdb, Array(0x01.toByte) ++ Array.fill(64)(1.toByte))
       else Array.emptyByteArray)
    val sofComps = (0 until nComp).flatMap { c =>
      Array((c + 1).toByte, 0x11.toByte, (if (c == 0) 0 else 1).toByte) // 1×1 sampling
    }.toArray
    val sof = segment(0xc0, Array(8.toByte) ++ u16(h) ++ u16(w) ++
      Array(nComp.toByte) ++ sofComps)
    val dht = segment(0xc4, dhtPayload(0, 0, DcLumBits, DcLumVals)) ++
      segment(0xc4, dhtPayload(1, 0, AcLumBits, AcLumVals)) ++
      (if (nComp == 3)
        segment(0xc4, dhtPayload(0, 1, DcChrBits, DcChrVals)) ++
          segment(0xc4, dhtPayload(1, 1, AcChrBits, AcChrVals))
       else Array.emptyByteArray)
    val sosComps = (0 until nComp).flatMap { c =>
      Array((c + 1).toByte, (if (c == 0) 0x00 else 0x11).toByte)
    }.toArray
    val sos = segment(0xda, Array(nComp.toByte) ++ sosComps ++
      Array(0.toByte, 63.toByte, 0.toByte))
    dqt ++ sof ++ dht ++ sos
  }

  /** Encode an 8-bit grayscale image as baseline JPEG (quant = all-ones). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"gray length ${gray.length} != $w*$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(headerSegments(w, h, 1))
    val bw = new BitWriter(out)
    val plane = gray.map(_ & 0xff)
    var dc = 0
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        dc = encodeBlock(bw, plane, bx, by, w, h, dc, encDcLum, encAcLum)
        bx += 8
      }
      by += 8
    }
    bw.flush()
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Encode RGB as baseline JPEG, YCbCr 4:4:4 (no subsampling). */
  def encodeRgb444(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w*$h*3")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte))
    out.write(headerSegments(w, h, 3))
    val n = w * h
    val yP = new Array[Int](n); val cbP = new Array[Int](n); val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      yP(i) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cbP(i) = clamp8(math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128).toInt)
      crP(i) = clamp8(math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128).toInt)
      i += 1
    }
    val bw = new BitWriter(out)
    var (dcY, dcCb, dcCr) = (0, 0, 0)
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) { // 4:4:4 MCU = one block per component, interleaved
        dcY = encodeBlock(bw, yP, bx, by, w, h, dcY, encDcLum, encAcLum)
        dcCb = encodeBlock(bw, cbP, bx, by, w, h, dcCb, encDcChr, encAcChr)
        dcCr = encodeBlock(bw, crP, bx, by, w, h, dcCr, encDcChr, encAcChr)
        bx += 8
      }
      by += 8
    }
    bw.flush()
    out.write(Array(0xff, 0xd9).map(_.toByte))
    out.toByteArray
  }

  private lazy val encDcLum = buildEncTable(DcLumBits, DcLumVals)
  private lazy val encAcLum = buildEncTable(AcLumBits, AcLumVals)
  private lazy val encDcChr = buildEncTable(DcChrBits, DcChrVals)
  private lazy val encAcChr = buildEncTable(AcChrBits, AcChrVals)

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // --------------------------------------------------------------- decode

  /** Canonical Huffman decode tables per T.81 F.2.2.3: mincode/maxcode/
    * valptr indexed by code length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def value(idx: Int): Int = vals(idx) & 0xff
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nb = 0
    def nextBit(): Int = {
      if (nb == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("JPEG: entropy stream truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val m = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (m == 0x00) pos += 1 // stuffed byte
          else if (m == 0xd9) { b = 0 /* EOI hit: pad zeros (spec-tolerant) */ ; pos -= 1 }
          else throw new IllegalArgumentException(
            f"JPEG: unsupported marker 0xff$m%02x inside scan (restart intervals unsupported)")
        }
        acc = b; nb = 8
      }
      nb -= 1
      (acc >> nb) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit(); var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | nextBit(); l += 1
      }
      if (l > 16) throw new IllegalArgumentException("JPEG: invalid Huffman code")
      t.value(t.valPtr(l) + code - t.minCode(l))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode baseline JPEG → (w, h, RGB raster). Grayscale expands to RGB. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"JPEG: $msg")
    if (!isJpeg(bytes)) fail("bad SOI signature")
    var pos = 2
    def u16at(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4); val acTabs = new Array[HuffTable](4)
    var w = -1; var h = -1
    // per component: (id, hSamp, vSamp, quantId, dcTabId, acTabId)
    var comps: Array[(Int, Int, Int, Int, Int, Int)] = null
    var scanStart = -1

    while (scanStart < 0) {
      if (pos + 4 > bytes.length) fail("truncated before SOS")
      if ((bytes(pos) & 0xff) != 0xff) fail(f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      val len = u16at(pos + 2)
      if (pos + 2 + len > bytes.length) fail(f"segment 0xff$marker%02x truncated")
      val seg = pos + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
            if (pq != 0) fail("16-bit quant tables unsupported")
            quant(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xff) >> 4; val th = bytes(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = bytes(p + l) & 0xff; total += bits(l) }
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if ((bytes(seg) & 0xff) != 8) fail("only 8-bit precision supported")
          h = u16at(seg + 1); w = u16at(seg + 3)
          val n = bytes(seg + 5) & 0xff
          if (n != 1 && n != 3) fail(s"unsupported component count $n")
          comps = Array.tabulate(n) { c =>
            val b = seg + 6 + 3 * c
            val id = bytes(b) & 0xff
            val hs = (bytes(b + 1) & 0xff) >> 4; val vs = bytes(b + 1) & 0x0f
            if (hs != 1 || vs != 1) fail("chroma subsampling unsupported (4:4:4 only)")
            (id, hs, vs, bytes(b + 2) & 0xff, -1, -1)
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          fail(f"unsupported SOF marker 0xff$marker%02x (progressive/extended/arithmetic)")
        case 0xdd => fail("restart intervals (DRI) unsupported")
        case 0xda => // SOS
          if (comps == null) fail("SOS before SOF0")
          val ns = bytes(seg) & 0xff
          if (ns != comps.length) fail("partial scans unsupported")
          for (c <- 0 until ns) {
            val id = bytes(seg + 1 + 2 * c) & 0xff
            val tabs = bytes(seg + 2 + 2 * c) & 0xff
            val ci = comps.indexWhere(_._1 == id)
            if (ci < 0) fail(s"SOS references unknown component $id")
            val cc = comps(ci)
            comps(ci) = (cc._1, cc._2, cc._3, cc._4, tabs >> 4, tabs & 0x0f)
          }
          scanStart = pos + 2 + len
        case 0xd9 => fail("EOI before SOS")
        case _ => () // APPn/COM/etc: skip
      }
      if (scanStart < 0) pos += 2 + len
    }

    val nComp = comps.length
    val planes = Array.fill(nComp)(new Array[Int](w * h))
    val br = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](nComp)
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        var c = 0
        while (c < nComp) {
          val (_, _, _, qId, dcId, acId) = comps(c)
          val q = quant(qId); val dcT = dcTabs(dcId); val acT = acTabs(acId)
          if (q == null || dcT == null || acT == null) fail("missing quant/Huffman table")
          val zz = new Array[Int](64)
          val s = br.decodeHuff(dcT)
          dcPred(c) += extend(br.receive(s), s)
          zz(0) = dcPred(c)
          var k = 1
          while (k < 64) {
            val rs = br.decodeHuff(acT)
            val r = rs >> 4; val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else k = 64         // EOB
            } else {
              k += r
              if (k > 63) fail("AC coefficient index overflow")
              zz(k) = extend(br.receive(sz), sz)
              k += 1
            }
          }
          val coef = new Array[Double](64)
          var i = 0
          while (i < 64) { coef(Zigzag(i)) = zz(i).toDouble * q(i); i += 1 }
          val px = idct(coef)
          val plane = planes(c)
          i = 0
          while (i < 64) {
            val x = by + i / 8; val y = bx + i % 8
            if (x < h && y < w)
              plane(x * w + y) = clamp8(math.round(px(i) + 128.0).toInt)
            i += 1
          }
          c += 1
        }
        bx += 8
      }
      by += 8
    }

    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    if (nComp == 1) {
      while (i < w * h) {
        val v = planes(0)(i).toByte
        rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
        i += 1
      }
    } else {
      while (i < w * h) {
        val y = planes(0)(i); val cb = planes(1)(i) - 128; val cr = planes(2)(i) - 128
        rgb(3 * i) = clamp8(math.round(y + 1.402 * cr).toInt).toByte
        rgb(3 * i + 1) = clamp8(math.round(y - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        rgb(3 * i + 2) = clamp8(math.round(y + 1.772 * cb).toInt).toByte
        i += 1
      }
    }
    (w, h, rgb)
  }

  /** Exact per-channel pixel sums (q184's statistic; gray ⇒ r=g=b). */
  def channelSums(bytes: Array[Byte]): (Int, Long, Long, Long) = {
    val (w, h, rgb) = decode(bytes)
    var (r, g, b) = (0L, 0L, 0L)
    var i = 0
    while (i < rgb.length) {
      r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
      i += 3
    }
    (w * h, r, g, b)
  }
}
