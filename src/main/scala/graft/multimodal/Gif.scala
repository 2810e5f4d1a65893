package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** REAL pure-JVM GIF87a/GIF89a codec — the ANIMATED raster format, which is
  * what makes it the honest stand-in for the video seam: a GIF payload is a
  * sequence of timed frames, so frame sampling, per-frame statistics, and
  * frame-timestamp extraction (the operations [[Multimodal.sampleFrames]]
  * models over stub video metadata) run against genuinely DECODED frames
  * here (q185). With PPM/PNG/JPEG/WAV already real, the codec stub now
  * covers only true native-library video codecs (H.264).
  *
  * Decode implements the format end-to-end from the public GIF89a
  * specification: logical screen descriptor, global/local color tables,
  * variable-width LSB-first LZW with the GIF off-by-one growth rule and
  * deferred-clear streams, sub-block reassembly, all four interlace passes,
  * graphic-control extensions (delay, transparency, disposal methods
  * none/keep/restore-background/restore-previous), and application/comment
  * extension skipping. Everything is deterministic integer byte-math, so
  * the driver-contract query (q185) oracle-checks the decoder itself: the
  * synthetic payloads' pixels are a closed form of the id, and DuckDB
  * recomputes per-frame position-weighted channel statistics without ever
  * seeing a byte — a wrong code width, a wrong interlace pass, or a wrong
  * delay accumulation breaks the hash.
  *
  * The encoder exists to MAKE test/oracle payloads (real dictionary LZW with
  * width growth and 4096-reset, optional interlace, sub-rect frames,
  * transparency, looping application extension); [[GifSpec]] also feeds the
  * decoder a clear-code-spam stream from an alternative trivially-correct
  * encoder so decode conformance is not merely round-trip-consistent.
  */
object Gif {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** One frame as stored: sub-rect raster of palette indices + control. */
  final case class Frame(left: Int, top: Int, w: Int, h: Int,
                         delayCs: Int, disposal: Int, transparentIdx: Int,
                         indices: Array[Byte], palette: Array[Int])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GIF: $msg")

  // ------------------------------------------------------------------ LZW

  /** Decode a GIF LZW stream (already reassembled from sub-blocks) into
    * exactly `expected` indices. Implements the spec's growth rule — the
    * decoder widens one code EARLIER than the encoder (at table size
    * 2^width − 1, because the encoder is one table entry ahead) — plus
    * deferred clear (table full at 4096: no adds until a CLEAR arrives). */
  private[multimodal] def lzwDecode(minCodeSize: Int, data: Array[Byte], expected: Int): Array[Byte] = {
    if (minCodeSize < 2 || minCodeSize > 8) fail(s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }

    val out = new Array[Byte](expected)
    var outN = 0
    var free = clear + 2
    var width = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    val stack = new Array[Byte](4096)

    def read(): Int = {
      if (bitPos + width > nBits) -1
      else {
        var v = 0
        var k = 0
        while (k < width) {
          val p = bitPos + k
          if ((data(p >> 3) >> (p & 7) & 1) != 0) v |= 1 << k
          k += 1
        }
        bitPos += width
        v
      }
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    def emit(code: Int): Unit = {
      var c = code
      var top = 0
      while (c >= 0) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      while (top > 0 && outN < expected) { top -= 1; out(outN) = stack(top); outN += 1 }
      if (top > 0) fail("raster overflow")
    }

    var done = false
    while (!done && outN < expected) {
      val code = read()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) { free = clear + 2; width = minCodeSize + 1; prev = -1 }
      else if (prev == -1) {
        if (code >= clear) fail(s"first code $code not a literal")
        emit(code); prev = code
      } else {
        if (code > free || code == clear || code == eoi) fail(s"code $code out of range (free=$free)")
        if (code == free) {
          // KwKwK: the entry being defined right now
          if (free >= 4096) fail("KwKwK with full table")
          prefix(free) = prev; suffix(free) = firstByte(prev)
          emit(free)
          free += 1
        } else {
          emit(code)
          if (free < 4096) { prefix(free) = prev; suffix(free) = firstByte(code); free += 1 }
        }
        // growth: the entry just added has value free−1; once that value is
        // 2^width − 1 the encoder (one entry ahead) may emit 2^width next
        if (width < 12 && free == (1 << width)) width += 1
        prev = code
      }
    }
    if (outN < expected) fail(s"short raster: $outN < $expected")
    out
  }

  /** Real dictionary LZW encoder (width growth, CLEAR+reset at 4096). */
  private[multimodal] def lzwEncode(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ArrayBuffer[Byte]()
    var cur = 0
    var curBits = 0
    var width = minCodeSize + 1
    def write(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) { out += (cur & 0xff).toByte; cur >>>= 8; curBits -= 8 }
    }
    // (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var free = clear + 2
    def reset(): Unit = { dict = new java.util.HashMap[Integer, Integer](8192); free = clear + 2; width = minCodeSize + 1 }

    write(clear)
    if (indices.nonEmpty) {
      var ib = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key = Integer.valueOf((ib << 8) | k)
        val hit = dict.get(key)
        if (hit != null) ib = hit.intValue()
        else {
          write(ib)
          if (free == 4096) { write(clear); reset() }
          else {
            dict.put(key, Integer.valueOf(free))
            val v = free
            free += 1
            // spec growth rule: once a table entry's VALUE reaches 2^width,
            // subsequent codes need width+1 bits
            if (v == (1 << width) && width < 12) width += 1
          }
          ib = k
        }
        i += 1
      }
      write(ib)
    }
    write(eoi)
    if (curBits > 0) out += (cur & 0xff).toByte
    out.toArray
  }

  /** Trivially-spec-correct alternative encoder: emits ONLY literal codes,
    * preceded by a CLEAR whenever the (unused) table would otherwise grow
    * past width — the classic "uncompressed GIF" trick. Exists so GifSpec
    * can prove [[lzwDecode]] against a second, independently-correct code
    * stream (exercising mid-stream clears) rather than only its own
    * encoder's round-trip. */
  private[multimodal] def lzwEncodeClearSpam(minCodeSize: Int, indices: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val width = minCodeSize + 1
    val out = new ArrayBuffer[Byte]()
    var cur = 0
    var curBits = 0
    def write(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) { out += (cur & 0xff).toByte; cur >>>= 8; curBits -= 8 }
    }
    write(clear)
    var sinceClear = 0
    var i = 0
    while (i < indices.length) {
      // a real decoder adds one entry per literal after the first; keep the
      // table small enough that codes never outgrow `width`
      if (sinceClear == clear - 2) { write(clear); sinceClear = 0 }
      write(indices(i) & 0xff)
      sinceClear += 1
      i += 1
    }
    write(eoi)
    if (curBits > 0) out += (cur & 0xff).toByte
    out.toArray
  }

  // ------------------------------------------------------------- container

  private val InterlacePasses: Array[(Int, Int)] = Array((0, 8), (4, 8), (2, 4), (1, 2))

  private def deinterlace(rows: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](rows.length)
    var src = 0
    var p = 0
    while (p < 4) {
      val (start, step) = InterlacePasses(p)
      var y = start
      while (y < h) {
        System.arraycopy(rows, src * w, out, y * w, w)
        src += 1
        y += step
      }
      p += 1
    }
    out
  }

  private def interlaceRows(rows: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](rows.length)
    var dst = 0
    var p = 0
    while (p < 4) {
      val (start, step) = InterlacePasses(p)
      var y = start
      while (y < h) {
        System.arraycopy(rows, y * w, out, dst * w, w)
        dst += 1
        y += step
      }
      p += 1
    }
    out
  }

  /** Decode the container → (canvasW, canvasH, backgroundRgb, frames). */
  def decodeFrames(bytes: Array[Byte]): (Int, Int, Int, Seq[Frame]) = {
    if (!isGif(bytes)) fail("bad magic")
    var i = 6
    def need(n: Int): Unit = if (i + n > bytes.length) fail(s"truncated at $i (need $n)")
    def u8(): Int = { need(1); val v = bytes(i) & 0xff; i += 1; v }
    def u16(): Int = { need(2); val v = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8); i += 2; v }
    def colorTable(n: Int): Array[Int] = {
      need(3 * n)
      val t = new Array[Int](n)
      var k = 0
      while (k < n) {
        t(k) = ((bytes(i) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) | (bytes(i + 2) & 0xff)
        i += 3; k += 1
      }
      t
    }
    val cw = u16(); val ch = u16()
    val packed = u8()
    val bgIndex = u8()
    u8() // pixel aspect ratio
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) colorTable(2 << (packed & 7)) else Array.emptyIntArray
    val bgRgb = if (gct.nonEmpty && bgIndex < gct.length) gct(bgIndex) else 0

    val frames = ArrayBuffer.empty[Frame]
    var delayCs = 0
    var disposal = 0
    var transparentIdx = -1
    var done = false
    while (!done && i < bytes.length) {
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension
          val label = u8()
          if (label == 0xf9) {
            val sz = u8()
            if (sz != 4) fail(s"GCE size $sz")
            need(5)
            val p = u8()
            disposal = (p >> 2) & 7
            delayCs = u16()
            val t = u8()
            transparentIdx = if ((p & 1) != 0) t else -1
            if (u8() != 0) fail("GCE not terminated")
          } else {
            // comment / application / plain-text: skip sub-blocks
            var n = u8()
            while (n != 0) { need(n); i += n; n = u8() }
          }
        case 0x2c => // image descriptor
          val left = u16(); val top = u16(); val fw = u16(); val fh = u16()
          val fp = u8()
          val lct = if ((fp & 0x80) != 0) colorTable(2 << (fp & 7)) else gct
          if (lct.isEmpty) fail("no color table")
          val interlaced = (fp & 0x40) != 0
          val minCode = u8()
          // reassemble LZW sub-blocks
          val data = new ArrayBuffer[Byte]()
          var n = u8()
          while (n != 0) {
            need(n)
            var k = 0
            while (k < n) { data += bytes(i + k); k += 1 }
            i += n
            n = u8()
          }
          var idx = lzwDecode(minCode, data.toArray, fw * fh)
          if (interlaced) idx = deinterlace(idx, fw, fh)
          frames += Frame(left, top, fw, fh, delayCs, disposal, transparentIdx, idx, lct)
          delayCs = 0; disposal = 0; transparentIdx = -1 // GCE applies to ONE image
        case b => fail(f"unknown block 0x$b%02x at ${i - 1}")
      }
    }
    (cw, ch, bgRgb, frames.toSeq)
  }

  /** Composite per-frame canvases: returns (canvasW, canvasH, one
    * (delayCs, rgbCanvas 3 bytes/pixel) per frame), applying the GIF
    * disposal model between frames (1=keep, 2=restore background,
    * 3=restore previous, 0=unspecified→keep) and transparent-index
    * punch-through within a frame. */
  def decodeRgbFrames(bytes: Array[Byte]): (Int, Int, Seq[(Int, Array[Byte])]) = {
    val (cw, ch, bgRgb, frames) = decodeFrames(bytes)
    val canvas = new Array[Byte](cw * ch * 3)
    def fillRect(left: Int, top: Int, w: Int, h: Int, rgb: Int): Unit = {
      var y = top
      while (y < top + h) {
        var x = left
        while (x < left + w) {
          val o = (y * cw + x) * 3
          canvas(o) = ((rgb >> 16) & 0xff).toByte
          canvas(o + 1) = ((rgb >> 8) & 0xff).toByte
          canvas(o + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
    }
    fillRect(0, 0, cw, ch, bgRgb)
    val out = frames.map { f =>
      val saved =
        if (f.disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length) else null
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val v = f.indices(y * f.w + x) & 0xff
          if (v != f.transparentIdx) {
            if (v >= f.palette.length) fail(s"index $v outside palette")
            val rgb = f.palette(v)
            val o = ((f.top + y) * cw + (f.left + x)) * 3
            canvas(o) = ((rgb >> 16) & 0xff).toByte
            canvas(o + 1) = ((rgb >> 8) & 0xff).toByte
            canvas(o + 2) = (rgb & 0xff).toByte
          }
          x += 1
        }
        y += 1
      }
      val snap = java.util.Arrays.copyOf(canvas, canvas.length)
      f.disposal match {
        case 2 => fillRect(f.left, f.top, f.w, f.h, bgRgb)
        case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      (f.delayCs, snap)
    }
    (cw, ch, out)
  }

  /** Frame to encode: sub-rect raster of indices into the global palette. */
  final case class EncFrame(left: Int, top: Int, w: Int, h: Int,
                            delayCs: Int, disposal: Int = 1,
                            transparentIdx: Int = -1,
                            interlaced: Boolean = false,
                            indices: Array[Byte])

  /** Encode an animated GIF89a with a global color table. `palette` entries
    * are 0xRRGGBB; size is rounded up to the next power of two ≥ 2. */
  def encode(canvasW: Int, canvasH: Int, palette: Array[Int],
             frames: Seq[EncFrame], loop: Boolean = false,
             comment: Option[String] = None): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, s"palette size ${palette.length}")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val tableN = 1 << bits
    val out = new ArrayBuffer[Byte](canvasW * canvasH)
    def w8(v: Int): Unit = out += (v & 0xff).toByte
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out ++= "GIF89a".getBytes("US-ASCII")
    w16(canvasW); w16(canvasH)
    w8(0x80 | ((bits - 1) & 7) << 4 | ((bits - 1) & 7)) // GCT present, size
    w8(0) // background color index
    w8(0) // aspect
    var k = 0
    while (k < tableN) {
      val rgb = if (k < palette.length) palette(k) else 0
      w8(rgb >> 16); w8(rgb >> 8); w8(rgb)
      k += 1
    }
    comment.foreach { c =>
      val cb = c.getBytes("US-ASCII")
      require(cb.length <= 255)
      w8(0x21); w8(0xfe); w8(cb.length); out ++= cb; w8(0)
    }
    if (loop) { // NETSCAPE2.0 infinite loop — exercises app-extension skip
      w8(0x21); w8(0xff); w8(11)
      out ++= "NETSCAPE2.0".getBytes("US-ASCII")
      w8(3); w8(1); w16(0); w8(0)
    }
    frames.foreach { f =>
      require(f.indices.length == f.w * f.h, "frame raster size")
      require(f.left + f.w <= canvasW && f.top + f.h <= canvasH, "frame outside canvas")
      w8(0x21); w8(0xf9); w8(4)
      w8(((f.disposal & 7) << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      w16(f.delayCs)
      w8(math.max(f.transparentIdx, 0))
      w8(0)
      w8(0x2c)
      w16(f.left); w16(f.top); w16(f.w); w16(f.h)
      w8(if (f.interlaced) 0x40 else 0)
      val minCode = math.max(bits, 2)
      w8(minCode)
      val raster = if (f.interlaced) interlaceRows(f.indices, f.w, f.h) else f.indices
      val lzw = lzwEncode(minCode, raster)
      var p = 0
      while (p < lzw.length) {
        val n = math.min(255, lzw.length - p)
        w8(n)
        var q = 0
        while (q < n) { out += lzw(p + q); q += 1 }
        p += n
      }
      w8(0)
    }
    w8(0x3b)
    out.toArray
  }

  /** Oracle-checkable per-frame decode statistic: one tuple per frame —
    * (frameIdx, presentationStartMs = 10·Σ earlier delays, nPixels of the
    * COMPOSITED canvas, Σr, Σg, Σb, position-weighted Σ(i+1)·r_i). The
    * weighted sum is what makes interlace/deinterlace and row order
    * oracle-visible (plain sums are permutation-invariant). */
  def frameStats(bytes: Array[Byte]): Seq[(Int, Long, Long, Long, Long, Long, Long)] = {
    val (cw, ch, frames) = decodeRgbFrames(bytes)
    var ts = 0L
    frames.zipWithIndex.map { case ((delayCs, rgb), fi) =>
      var (r, g, b, wr) = (0L, 0L, 0L, 0L)
      var i = 0
      val n = cw * ch
      while (i < n) {
        val rv = rgb(i * 3) & 0xff
        r += rv; g += rgb(i * 3 + 1) & 0xff; b += rgb(i * 3 + 2) & 0xff
        wr += (i + 1).toLong * rv
        i += 1
      }
      val row = (fi, ts * 10L, n.toLong, r, g, b, wr)
      ts += delayCs
      row
    }
  }

  /** REAL animated resize: decode all frames, nearest-neighbor resample each
    * frame's INDEX raster (palette preserved — the standard GIF resize),
    * re-encode with the same global palette and timing. Sub-rect frames are
    * composited to full canvas first (resampling a sub-rect independently
    * would misalign it against the scaled canvas). */
  def resize(bytes: Array[Byte], wOut: Int, hOut: Int): Array[Byte] = {
    val (cw, ch, _, frames) = decodeFrames(bytes)
    if (frames.isEmpty) fail("no frames")
    val palette = frames.head.palette
    // composite INDEX canvases (same disposal model as decodeRgbFrames)
    val canvas = new Array[Byte](cw * ch) // starts at index 0
    val encFrames = frames.map { f =>
      val saved = if (f.disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length) else null
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val v = f.indices(y * f.w + x) & 0xff
          if (v != f.transparentIdx) canvas((f.top + y) * cw + (f.left + x)) = v.toByte
          x += 1
        }
        y += 1
      }
      val out = new Array[Byte](wOut * hOut)
      var yo = 0
      while (yo < hOut) {
        val sy = yo * ch / hOut
        var xo = 0
        while (xo < wOut) {
          out(yo * wOut + xo) = canvas(sy * cw + xo * cw / wOut)
          xo += 1
        }
        yo += 1
      }
      f.disposal match {
        case 2 => java.util.Arrays.fill(canvas, 0.toByte)
        case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      EncFrame(0, 0, wOut, hOut, f.delayCs, disposal = 1, indices = out)
    }
    encode(wOut, hOut, palette, encFrames)
  }
}
