package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode/feature/resize/
  * frame-sample operators.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape,
  * operator signatures — is real and tested. The codec boundary is split
  * honestly: formats decodable in pure JVM code are REALLY decoded —
  * binary PPM ([[Codecs]], q166), PNG ([[Codecs]], zlib + filters, q183),
  * baseline JPEG ([[Jpeg]], Huffman + IDCT, q184), RIFF/WAV PCM16
  * ([[Codecs]], q167) — dispatched by magic bytes and oracle-checked
  * end-to-end; only VIDEO codecs (H.264) still fall through to the
  * clearly-marked DETERMINISTIC STUB, swappable for a real codec by
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
    * stub maps payload bytes -> pseudo feature vector via per-feature MD5
    * digests — a pure, reproducible function of the payload, and chosen
    * over xxhash64 deliberately: MD5 is available in every SQL engine, so
    * the fake features have a CLOSED-FORM oracle (q50's DuckDB SQL
    * recomputes v_i = (hex16(md5(bytes || ':' || i)) % 2001 − 1000)/1000
    * verbatim — hash-exact, where the xxhash64 stub was rows-only).
    * Feature i reads the first 16 bits of md5(bytes ++ ":i"); float
    * division by 1000.0f last, so the only rounding is one float4 divide
    * mirrored identically in SQL.
    */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(featureDim) { i =>
      md.reset()
      md.update(bytes)
      md.update(s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      // double divide, then ONE narrowing to float — the exact shape
      // cast((x % 2001 - 1000) / 1000.0 as float) takes in SQL
      (((v % 2001) - 1000) / 1000.0).toFloat
    }
  }

  /** RIFF with the WAVE form type (AVI is RIFF too — form type disambiguates). */
  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** True iff `bytes` is a format [[Codecs]]/[[Jpeg]]/[[Gif]]/[[Avi]]/
    * [[H264]] really decodes. */
  def isRealFormat(bytes: Array[Byte]): Boolean =
    (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') ||
      Codecs.isPng(bytes) || Jpeg.isJpeg(bytes) || Gif.isGif(bytes) ||
      Avi.isAvi(bytes) || isWav(bytes) || H264.isAnnexB(bytes)

  /** Real features for really-decodable payloads: PPM/PNG → [w, h,
    * n_pixels, meanR, meanG, meanB, 0…]; WAV → [sampleRate, n, rms,
    * zcRate, 0…] — deterministic arithmetic on exact integer decode
    * statistics. */
  private def realDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (Gif.isGif(bytes)) {
      // animated: first-frame composite stats + frame count + total duration
      val (w, h, frames) = Gif.decodeRgbFrames(bytes)
      val rgb = frames.head._2
      var (r, g, b) = (0L, 0L, 0L)
      var i = 0
      while (i < rgb.length) { r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff; i += 3 }
      val n = w * h
      out(0) = w.toFloat; out(1) = h.toFloat; out(2) = n.toFloat
      out(3) = r.toFloat / n; out(4) = g.toFloat / n; out(5) = b.toFloat / n
      out(6) = frames.size.toFloat
      out(7) = frames.map(_._1).sum.toFloat * 10 // total duration ms
    } else if (Avi.isAvi(bytes)) {
      // video: frame count, dims, fps, first-frame mean luminance
      val stats = Avi.frameStats(bytes)
      val (w, h, scale, rate, _) = Avi.decodeMjpeg(bytes)
      val s0 = stats.head
      out(0) = w.toFloat; out(1) = h.toFloat; out(2) = s0._3.toFloat
      out(3) = s0._4.toFloat / s0._3; out(4) = s0._5.toFloat / s0._3; out(5) = s0._6.toFloat / s0._3
      out(6) = stats.size.toFloat
      out(7) = stats.size.toFloat * 1000f * scale / rate // total duration ms
    } else if (bytes(0) == 'P' || Codecs.isPng(bytes) || Jpeg.isJpeg(bytes)) {
      val (w, h, rgb) =
        if (Codecs.isPng(bytes)) Codecs.decodePng(bytes)
        else if (Jpeg.isJpeg(bytes)) Jpeg.decode(bytes)
        else Codecs.decodePpm(bytes)
      val (n, r, g, b) =
        if (Codecs.isPng(bytes)) Codecs.pngChannelSums(bytes)
        else if (Jpeg.isJpeg(bytes)) Jpeg.channelSums(bytes)
        else Codecs.ppmChannelSums(bytes)
      out(0) = w.toFloat; out(1) = h.toFloat; out(2) = n.toFloat
      out(3) = r.toFloat / n; out(4) = g.toFloat / n; out(5) = b.toFloat / n
      out(6) = rgb.length.toFloat
    } else {
      val (_, rate, samples) = Codecs.decodeWavAny(bytes)
      val (n, sumSq, zc) = Codecs.wavStats(bytes)
      out(0) = rate.toFloat; out(1) = n.toFloat
      out(2) = math.sqrt(sumSq.toDouble / math.max(n, 1)).toFloat
      out(3) = zc.toFloat / math.max(n, 1)
      out(6) = samples.length.toFloat
    }
    out
  }

  /** Feature extraction over the media table: per-partition batching via
    * mapPartitions (one decoder init per task, not per row — the pattern a
    * real codec needs). Payloads in really-decodable formats (PPM, WAV) get
    * REAL decode features; others the deterministic stub.
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
        val bytes = r.getAs[Array[Byte]]("bytes")
        val feats = if (isRealFormat(bytes)) realDecodeFeatures(bytes)
                    else stubDecodeFeatures(bytes)
        Row(r.getLong(0), r.getString(1), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image channel statistics (decode proof): one row per PPM or PNG
    * payload with exact integer pixel sums — the q166/q183 operator.
    * Dispatched by magic bytes; other formats are filtered engine-side so a
    * mixed media table is fine. */
  def imageChannelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
          val (n, sr, sg, sb) = Codecs.ppmChannelSums(bytes)
          Some(Row(r.getLong(0), n.toLong, sr, sg, sb))
        } else if (Codecs.isPng(bytes)) {
          val (n, sr, sg, sb) = Codecs.pngChannelSums(bytes)
          Some(Row(r.getLong(0), n.toLong, sr, sg, sb))
        } else if (Jpeg.isJpeg(bytes)) {
          val (n, sr, sg, sb) = Jpeg.channelSums(bytes)
          Some(Row(r.getLong(0), n.toLong, sr, sg, sb))
        } else if (Gif.isGif(bytes)) {
          // animated: the image statistic is the FIRST frame's composite
          val s0 = Gif.frameStats(bytes).head
          Some(Row(r.getLong(0), s0._3, s0._4, s0._5, s0._6))
        } else None
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio statistics (decode proof): exact (n, Σs², zero crossings)
    * per WAV payload — the q167 operator. */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (isWav(bytes)) { // WAVE form type only: AVI is RIFF too
          val (n, sumSq, zc) = Codecs.wavStats(bytes)
          Some(Row(r.getLong(0), n.toLong, sumSq, zc))
        } else None
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL companded-audio decode statistics (q188): one row per WAV payload
    * in ANY supported encoding — PCM16 passthrough, G.711 μ-law, G.711
    * A-law — with the format NAME read from the decoded `fmt ` chunk and
    * exact (n, Σ linear, Σ linear²) over the EXPANDED 16-bit samples. The
    * A-law/μ-law sign conventions differ (A-law bit 7 set = positive,
    * μ-law = negative), so sum_lin is sign-convention-proof, not just
    * table-proof. */
  def audioLinearStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_lin", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        if (isWav(bytes)) {
          val (fmtCode, _, s) = Codecs.decodeWavAny(bytes)
          val name = fmtCode match {
            case 1 => "pcm16"
            case 6 => "alaw"
            case 7 => "ulaw"
          }
          var lin = 0L; var sq = 0L
          var i = 0
          while (i < s.length) { lin += s(i); sq += s(i).toLong * s(i).toLong; i += 1 }
          Some(Row(r.getLong(0), name, s.length.toLong, lin, sq))
        } else None
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** G.711 WAV media table (q188): 240 code bytes per id, closed form
    * (id·7 + i·13) mod 256, companded as μ-law for even ids and A-law for
    * odd ids — both real RIFF/WAVE files with format codes 7/6. */
  def syntheticG711FromIds(df: DataFrame, idCol: String, n: Int = 240,
                           sampleRate: Int = 8000): DataFrame = {
    val gen = udf { (id: Long) =>
      val codes = Array.tabulate(n)(i => ((id * 7 + i * 13) % 256).toByte)
      Codecs.encodeWavG711(sampleRate, codes, mulaw = id % 2 == 0)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("audio").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("g711").as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(n.toLong * 1000 / sampleRate).as("duration_ms"),
        lit(sampleRate).as("sample_rate")).as("meta"))
  }

  /** Resize: PPM payloads get a REAL nearest-neighbor decode→resample→
    * re-encode ([[Codecs.resizePpm]]); formats needing native decoders keep
    * the deterministic stub rewrite. Schema/partitioning identical either
    * way, so a native resampler drops into the same seam.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeBytes = udf { (bytes: Array[Byte]) =>
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
        Codecs.resizePpm(bytes, w, h) // REAL nearest-neighbor resample
      else if (Codecs.isPng(bytes))
        Codecs.resizePng(bytes, w, h) // REAL: inflate, unfilter, resample, re-encode
      else if (Gif.isGif(bytes))
        Gif.resize(bytes, w, h) // REAL: per-frame index-raster NN resample
      else if (Jpeg.isJpeg(bytes)) {
        // REAL: full baseline decode -> NN resample -> re-encode (lossy, as
        // any JPEG resize pipeline is)
        val (wIn, hIn, rgb) = Jpeg.decode(bytes)
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val sy = y * hIn / h
          var x = 0
          while (x < w) {
            val sx = x * wIn / w
            val si = (sy * wIn + sx) * 3; val di = (y * w + x) * 3
            out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
            x += 1
          }
          y += 1
        }
        Jpeg.encodeRgb444(w, h, out)
      } else {
        // ==== STUB ==== (non-decodable formats) real: decode -> scale -> re-encode
        val seed = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, (w.toLong << 32) | h.toLong)
        val out = new Array[Byte](64)
        var i = 0
        while (i < out.length) { out(i) = ((seed >>> (i % 8 * 8)) & 0xff).toByte; i += 1 }
        out
      }
    }
    media
      .withColumn("bytes", resizeBytes(col("bytes")))
      .withColumn("meta", col("meta")
        .withField("width", lit(w))
        .withField("height", lit(h)))
  }

  /** REAL frame sampling + per-frame decode statistics for animated GIF
    * payloads (q185): every `sampleEvery`-th DECODED frame becomes a row —
    * (frame_idx, presentation timestamp from accumulated GCE delays,
    * composited-canvas pixel count, channel sums, position-weighted red sum).
    * The weighted sum is the interlace/row-order proof: plain channel sums
    * are permutation-invariant, so a wrong deinterlace pass or stride would
    * still match them — `wsum_r` breaks instead. This is the video
    * frame-sample semantics running against genuinely decoded frames; only
    * native-codec video (H.264) remains behind [[sampleFrames]]'s
    * metadata-grid stub path. */
  def gifFrameStats(media: DataFrame, sampleEvery: Int = 1): DataFrame =
    videoFrameStats(media, sampleEvery)

  /** Same operator, dispatched by magic bytes across BOTH really-decoded
    * moving-picture formats: animated GIF ([[Gif.frameStats]]) and MJPEG
    * AVI ([[Avi.frameStats]] — RIFF walk + per-frame baseline-JPEG decode,
    * q187). One row per sampled frame; rows in other formats are filtered
    * engine-side so a mixed media table is fine. */
  def videoFrameStats(media: DataFrame, sampleEvery: Int = 1): DataFrame = {
    require(sampleEvery >= 1, s"sampleEvery $sampleEvery")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ts_ms", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("wsum_r", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val stats =
          if (Gif.isGif(bytes)) Gif.frameStats(bytes)
          else if (Avi.isAvi(bytes)) Avi.frameStats(bytes)
          else if (H264.isAnnexB(bytes)) H264.frameStats(bytes)
          else Nil
        stats.collect {
          case (fi, ts, n, sr, sg, sb, wr) if fi % sampleEvery == 0 =>
            Row(r.getLong(0), fi, ts, n, sr, sg, sb, wr)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode-normalized pixel digest for image payloads — the key for
    * CROSS-FORMAT exact image dedup (q186): the same picture stored as PPM,
    * PNG, or GIF hashes identically because the digest is computed over the
    * DECODED w×h×RGB raster (dimension-prefixed), never over container
    * bytes. Lossless formats only — a lossy JPEG of "the same" image is a
    * different raster by definition and is deliberately left out. At scale
    * only (media_id, 16-byte digest) ever shuffles; pixels stay in the
    * scan-side task. */
  def decodedPixelDigest(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("pixel_digest", StringType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-task init
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val decoded: Option[(Int, Int, Array[Byte])] =
          if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
            Some(Codecs.decodePpm(bytes))
          else if (Codecs.isPng(bytes)) Some(Codecs.decodePng(bytes))
          else if (Gif.isGif(bytes)) {
            val (w, h, frames) = Gif.decodeRgbFrames(bytes)
            Some((w, h, frames.head._2))
          } else None
        decoded.map { case (w, h, rgb) =>
          md.reset()
          md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
          md.update(rgb)
          Row(r.getLong(0), md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------- perceptual image hashes
  // aHash/dHash over DECODED pixels (the public average-hash / difference-
  // hash family every LAION-style image-dedup pipeline uses): grayscale,
  // block-mean downsample to a tiny grid, derive 64 comparison bits. Near-
  // duplicate images (small edits, re-encodes, lossy round-trips) land
  // within a small Hamming distance; clustering happens on the DISTINCT
  // hash table via banded grouping, so image count never enters a pairwise
  // join — the 100 TB shape is scan (decode+hash) → hash-distinct groupBy →
  // banded join over the far smaller distinct-hash table.

  /** Integer luma, the Rec.601 weights with exact floor division —
    * (299·R + 587·G + 114·B) div 1000 — so every engine (and the DuckDB
    * oracle) reproduces the gray plane bit-exactly. */
  @inline private def luma(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  /** Block-mean gray grid `gw`×`gh` (row-major) from a w×h RGB raster.
    * Block boundaries are the floor map x0 = ⌊cx·w/gw⌋ (works for any
    * dimensions, exact when gw | w), cell value = ⌊Σ luma / n⌋ — all
    * integer, so the grid is engine-reproducible from the pixel values. */
  private[multimodal] def grayGrid(w: Int, h: Int, rgb: Array[Byte],
                                   gw: Int, gh: Int): Array[Int] = {
    require(w >= gw && h >= gh, s"raster ${w}x$h smaller than grid ${gw}x$gh")
    val out = new Array[Int](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh; val y1 = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw; val x1 = (cx + 1) * w / gw
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = 3 * (y * w + x)
            sum += luma(rgb(p) & 0xff, rgb(p + 1) & 0xff, rgb(p + 2) & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** dHash64 over a 9×8 grid: bit r·8+c set iff cell(r,c+1) > cell(r,c) —
    * the horizontal-gradient difference hash. */
  private[multimodal] def dhash64(grid9x8: Array[Int]): Long = {
    require(grid9x8.length == 72, s"dhash64 needs a 9x8 grid, got ${grid9x8.length}")
    var hsh = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid9x8(r * 9 + c + 1) > grid9x8(r * 9 + c)) hsh |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hsh
  }

  /** aHash64 over an 8×8 grid: bit r·8+c set iff cell > ⌊Σcells/64⌋. */
  private[multimodal] def ahash64(grid8x8: Array[Int]): Long = {
    require(grid8x8.length == 64, s"ahash64 needs an 8x8 grid, got ${grid8x8.length}")
    var sum = 0L
    var i = 0
    while (i < 64) { sum += grid8x8(i); i += 1 }
    val mean = sum / 64
    var hsh = 0L
    i = 0
    while (i < 64) {
      if (grid8x8(i) > mean) hsh |= 1L << i
      i += 1
    }
    hsh
  }

  /** (media_id, dhash, ahash) for every decodable image payload — PPM, PNG,
    * GIF (first frame), or baseline JPEG, dispatched by magic bytes. The
    * decode+hash is a mapPartitions scan (embarrassingly parallel, pixels
    * never leave the task); only 17 bytes per image ever shuffle. Lossy
    * JPEG is included deliberately: unlike [[decodedPixelDigest]]'s exact
    * dedup, perceptual hashes are STABLE under a lossy round-trip — the
    * same picture as PNG and as its JPEG re-encode lands within a small
    * Hamming distance (MultimodalSpec pins a cross-format pair). */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val decoded: Option[(Int, Int, Array[Byte])] =
          if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
            Some(Codecs.decodePpm(bytes))
          else if (Codecs.isPng(bytes)) Some(Codecs.decodePng(bytes))
          else if (Gif.isGif(bytes)) {
            val (w, h, frames) = Gif.decodeRgbFrames(bytes)
            Some((w, h, frames.head._2))
          } else if (Jpeg.isJpeg(bytes)) Some(Jpeg.decode(bytes))
          else None
        decoded.map { case (w, h, rgb) =>
          Row(r.getLong(0), dhash64(grayGrid(w, h, rgb, 9, 8)),
            ahash64(grayGrid(w, h, rgb, 8, 8)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------- DCT spectral hash
  // The pHash idea (the public DCT perceptual hash): downsample to 32×32
  // gray, take the low-frequency corner of the 2-D DCT-II, derive 64 bits.
  // Bits here are COEFFICIENT SIGNS (the SimHash-style sign-projection
  // variant) rather than median comparisons: sign bits flip only where a
  // coefficient's magnitude falls under the perturbation, which is what
  // makes the hash stable under crop/rescale/re-encode — exactly the
  // robustness dHash's local gradients lack (MultimodalSpec measures a
  // crop pair that the spectral hash clusters and dHash misses). All
  // arithmetic is integer Q10 fixed-point so every engine (and the DuckDB
  // oracle, which inlines the same 256-entry table as literals and shares
  // no code) reproduces the hash bit-exactly.

  /** Q10 DCT-II basis rows u = 0..7 over n = 0..31: T(u)(n) =
    * round(cos(π·(2n+1)·u/64)·1024). StrictMath (not Math) so the table
    * is bit-identical on every JVM; only the 8 low-frequency rows exist
    * because the hash never reads coefficients above u,v = 7. */
  private[graft] val dctQ10: Array[Array[Int]] =
    Array.tabulate(8, 32)((u, n) =>
      StrictMath.round(StrictMath.cos(StrictMath.PI * (2 * n + 1) * u / 64.0) * 1024.0).toInt)

  /** Spectral hash over a 32×32 gray grid (row-major gy·32+gx): bit
    * u·8+v set iff F(u,v) = Σ grid·T(u)(gy)·T(v)(gx) > 0, DC bit 0 always
    * clear. |F| ≤ 1024·255·2²⁰ < 2⁴⁸ — exact in Long, no overflow path. */
  private[multimodal] def dctSignHash64(grid32: Array[Int]): Long = {
    require(grid32.length == 1024, s"dctSignHash64 needs a 32x32 grid, got ${grid32.length}")
    val t = dctQ10
    // separable: s(u)(x) = Σ_gy grid(gy,x)·T(u)(gy), then F(u,v) = Σ_x s(u)(x)·T(v)(x)
    val s = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        var acc = 0L; var gy = 0
        while (gy < 32) { acc += grid32(gy * 32 + x).toLong * t(u)(gy); gy += 1 }
        s(u)(x) = acc; x += 1
      }
      u += 1
    }
    var hsh = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var acc = 0L; var x = 0
          while (x < 32) { acc += s(u)(x) * t(v)(x); x += 1 }
          if (acc > 0L) hsh |= 1L << (u * 8 + v)
        }
        v += 1
      }
      u += 1
    }
    hsh
  }

  /** Decode + both hashes for one image payload (PPM/PNG/GIF/JPEG by magic
    * bytes, ≥ 32×32) — null when undecodable or below the spectral grid's
    * resolution. The per-row kernel behind
    * [[graft.functions.MediaExprs.spectral_hashes]]. */
  private[graft] def spectralHashPair(bytes: Array[Byte]): (Long, Long) = {
    val decoded: Option[(Int, Int, Array[Byte])] =
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
        Some(Codecs.decodePpm(bytes))
      else if (Codecs.isPng(bytes)) Some(Codecs.decodePng(bytes))
      else if (Gif.isGif(bytes)) {
        val (w, h, frames) = Gif.decodeRgbFrames(bytes)
        Some((w, h, frames.head._2))
      } else if (Jpeg.isJpeg(bytes)) Some(Jpeg.decode(bytes))
      else None
    decoded match {
      case Some((w, h, rgb)) if w >= 32 && h >= 32 =>
        (dctSignHash64(grayGrid(w, h, rgb, 32, 32)), dhash64(grayGrid(w, h, rgb, 9, 8)))
      case _ => null
    }
  }

  /** (media_id, phash, dhash) for every decodable image ≥ 32×32 — the
    * spectral hash beside the gradient hash. A typed mapPartitions (a
    * streaming-compatible operator, unlike an RDD hop — q290 runs it
    * unchanged under AvailableNow), decoding each payload exactly ONCE:
    * the pure-projection form ([[graft.functions.MediaExprs
    * .spectral_hashes]], kept for expression composition) re-evaluates
    * the decode when a filter is pushed through it, doubling the scan.
    * Images smaller than the 32×32 grid are skipped. */
  def spectralHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        spectralHashPair(bytes) match {
          case null => None
          case (p, d) => Some((id, p, d))
        }
      })
      .toDF("media_id", "phash", "dhash")
  }

  /** Closed-form 32×32 cell value of the crop/rescale fixture: the grid is
    * an INVERSE DCT of class-dependent ±1 low-frequency coefficients —
    * cell(k, gy, gx) = clamp(128 + (Σ_{(u,v)≠(0,0), u,v<8} s_k(u,v)·
    * T(u)(gy)·T(v)(gx)) quot 2¹⁷) with s_k(u,v) = ±1 from bit u·8+v of
    * k·2654435761 (quot = truncating division, matching DuckDB's `//`).
    * Forward-DCT of this grid recovers the 63 signs, so each class's
    * spectral hash is a distinct 63-bit pattern (measured min cross-class
    * Hamming 11 for k < 41) while crop leakage stays under every
    * coefficient's magnitude (measured within-class ≤ 3). */
  private[graft] def cropRescaleCell(k: Long, gy: Int, gx: Int): Int = {
    val bits = k * 2654435761L
    var sum = 0L
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          val s = if (((bits >>> (u * 8 + v)) & 1L) == 1L) 1L else -1L
          sum += s * dctQ10(u)(gy) * dctQ10(v)(gx)
        }
        v += 1
      }
      u += 1
    }
    val v = 128 + (sum / 131072L).toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  /** Crop/rescale near-dup image fixture (q284's input): class k = id mod
    * `classes` picks the base picture ([[cropRescaleCell]]); variant
    * v = (id div classes) mod 3 renders it as the 64×64 original (v=0),
    * the 128×128 2× upscale (v=1 — same 32×32 block means exactly), or
    * the 58×58 3-px-border CROP (v=2 — block means re-mix across cell
    * boundaries); the container cycles PPM/PNG by id mod 2. Measured for
    * k < 41: within-class spectral-hash Hamming ≤ 3, cross-class ≥ 11 —
    * threshold 3 separates exactly — while the crop moves dHash by up to
    * 16 bits (min 3), so gradient hashing breaks these clusters and only
    * decode → 32×32 grid → integer DCT → sign bits → banded Hamming
    * reproduces the oracle. */
  def syntheticCropRescaleImages(df: DataFrame, idCol: String,
                                 classes: Int = 41): DataFrame = {
    require(classes >= 1 && classes <= 41,
      s"fixture separation is verified for classes<=41; got $classes")
    val gen = udf { (id: Long) =>
      val k = id % classes
      val v = (id / classes) % 3
      val cells = rasterCache.computeIfAbsent((k, v), _ => {
        val base = Array.tabulate(32, 32)((gy, gx) => cropRescaleCell(k, gy, gx))
        val (w, crop, scale) = v match {
          case 0L => (64, 0, 2)
          case 1L => (128, 0, 4)
          case _ => (58, 3, 2)
        }
        val rgb = new Array[Byte](w * w * 3)
        var y = 0
        while (y < w) {
          var x = 0
          while (x < w) {
            val g = base((y + crop) / scale)((x + crop) / scale).toByte
            val p = 3 * (y * w + x)
            rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
            x += 1
          }
          y += 1
        }
        (w, rgb)
      })
      val (w, rgb) = cells
      if (id % 2 == 0) Codecs.encodePpm(w, w, rgb) else Codecs.encodePng(w, w, rgb)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("mixed").as("format"), lit(64).as("width"), lit(64).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }
  /** Per-executor raster memo for the crop/rescale fixture: 41 classes ×
    * 3 variants = 123 rasters; generation cost stays O(distinct), not
    * O(images). Keys never collide across scale factors (content is a
    * pure function of (k, v)). */
  private val rasterCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long), (Int, Array[Byte])]()

  // ------------------------------------------------- audio fingerprint near-dup
  // Spectral-flux sign fingerprinting (the Haitsma–Kalker family, temporal
  // variant): window the PCM into 9×32 samples, measure 8 band energies
  // per window through the SAME integer Q10 DCT rows as the image hash,
  // fingerprint bit (w−1)·8+u = [E(w,u) > E(w−1,u)]. Energy-ratio signs
  // are invariant under exact amplitude scaling and, with ≥2.25× margins,
  // under G.711 companding noise (~3% relative) — so a μ-law re-encode and
  // a half-volume master fingerprint identically, which is what exact
  // payload hashing can never see.

  /** 64-bit spectral-flux fingerprint over the first 288 linear PCM
    * samples: E(w,u) = (Σ_{n<32} x(32w+n)·T(u)(n))², bit (w−1)·8+u set iff
    * E(w,u) > E(w−1,u). |coef| < 2³⁰ ⇒ E < 2⁶⁰ — exact in Long. */
  private[graft] def audioFp64(x: Array[Short]): Long = {
    require(x.length >= 288, s"audioFp64 needs >= 288 samples, got ${x.length}")
    val t = dctQ10
    val e = Array.ofDim[Long](9, 8)
    var w = 0
    while (w < 9) {
      var u = 0
      while (u < 8) {
        var acc = 0L; var n = 0
        while (n < 32) { acc += x(32 * w + n) * t(u)(n); n += 1 }
        e(w)(u) = acc * acc; u += 1
      }
      w += 1
    }
    var hsh = 0L
    w = 1
    while (w < 9) {
      var u = 0
      while (u < 8) {
        if (e(w)(u) > e(w - 1)(u)) hsh |= 1L << ((w - 1) * 8 + u)
        u += 1
      }
      w += 1
    }
    hsh
  }

  /** (media_id, fmt, afp) for every decodable RIFF/WAVE payload with ≥288
    * samples: the container's format code (1 PCM16, 7 μ-law, 6 A-law —
    * part of the decode proof) and the spectral-flux fingerprint over the
    * expanded linear samples. A typed mapPartitions — streaming-legal
    * (q291 drains the same operator under AvailableNow), one decode per
    * payload, 20 bytes out per clip. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I') {
          val (fmt, _, samples) = Codecs.decodeWavAny(bytes)
          if (samples.length >= 288) Some((id, fmt, audioFp64(samples)))
          else None
        } else None
      })
      .toDF("media_id", "fmt", "afp")
  }

  /** Closed-form band bit of the audio fixture: n = k·72+w·8+u+1,
    * h31 = (n·2654435761) mod 2³¹, z = h31 xor (h31 >> 15) (the xor breaks
    * the multiplicative hash's arithmetic-progression correlation), bit =
    * (z·2246822519) >> 43 & 1. The remix variant inverts bits (w=8, u<2). */
  private[graft] def audioRBit(k: Long, w: Int, u: Int, remix: Boolean): Int = {
    val n = k * 72 + w * 8 + u + 1
    val h31 = (n * 2654435761L) & 0x7FFFFFFFL
    val z = h31 ^ (h31 >>> 15)
    val b = (((z * 2246822519L) >>> 43) & 1L).toInt
    if (remix && w == 8 && u < 2) 1 - b else b
  }
  /** Window-band amplitude: 2·rbit + (w mod 2) — consecutive windows carry
    * different parities, so every energy comparison has a ≥2.25× ratio
    * margin (amp² levels {0,4} vs {1,9}) and the fingerprint is a CLOSED
    * FORM of the bits: E(w,u) > E(w−1,u) ⟺ amp(w,u)² > amp(w−1,u)². */
  private[graft] def audioAmp(k: Long, w: Int, u: Int, remix: Boolean): Int =
    2 * audioRBit(k, w, u, remix) + (w % 2)

  /** Audio near-dup fixture (q286's input): class k = id mod `classes` is
    * a 288-sample composition x(32w+n) = ((Σ_u amp·T(u)(n)) quot 4)·2 —
    * EVEN samples, so the half-volume master divides exactly; variant
    * v = (id div classes) mod 3 renders it as PCM16 WAV (v=0), as a
    * G.711 μ-LAW re-encode (v=1 — nearest-level companding; the ~3%
    * noise sits under every energy margin, fingerprint IDENTICAL), or as
    * a HALF-VOLUME master with the last window's two low bands remixed
    * (v=2 — fingerprint within Hamming 2). Cross-class fingerprints stay
    * ≥8 apart (measured, k < 41), so threshold 3 separates exactly. */
  def syntheticNearDupAudio(df: DataFrame, idCol: String,
                            classes: Int = 41): DataFrame = {
    require(classes >= 1 && classes <= 41, s"classes=$classes")
    val gen = udf { (id: Long) =>
      val k = id % classes
      val v = (id / classes) % 3
      audioCache.computeIfAbsent((k, v), _ => {
        val remix = v == 2L
        val x = new Array[Short](288)
        var w = 0
        while (w < 9) {
          var n = 0
          while (n < 32) {
            var s = 0L
            var u = 0
            while (u < 8) { s += audioAmp(k, w, u, remix).toLong * dctQ10(u)(n); u += 1 }
            val q = (if (s >= 0) s / 4 else -((-s) / 4)) * 2
            x(32 * w + n) = (if (v == 2L) q / 2 else q).toShort
            n += 1
          }
          w += 1
        }
        if (v == 1L) Codecs.encodeWavG711(8000, x.map(Codecs.ulawNearestCode), mulaw = true)
        else Codecs.encodeWavPcm16(8000, x)
      })
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("audio").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("wav").as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(36L).as("duration_ms"),
        lit(8000).as("sample_rate")).as("meta"))
  }
  private val audioCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long), Array[Byte]]()

  // ------------------------------------------------- video near-dup
  // Clip-level near-duplicate detection by frame fingerprinting (the
  // public video copy-detection shape: per-frame perceptual hash → shared-
  // fingerprint candidate join → match-count verify). Composes the q187/
  // q245 frame extraction with the q275 perceptual kernels: a re-encoded
  // clip (different container, same pictures) and a trimmed clip (frames
  // dropped) both keep most frame hashes, so they cluster with the
  // original — while exact payload digests see three unrelated blobs.

  /** Per-frame perceptual hashes for really-decoded moving pictures —
    * animated GIF, MJPEG AVI, H.264 I_PCM — one row per frame:
    * (media_id, frame_idx, fhash = dHash64 of the frame's 9×8 block-mean
    * gray grid). Rasters never leave the scan task; 20 bytes per frame
    * do. Frames smaller than the 9×8 grid are skipped. */
  def videoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("fhash", LongType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val frames: Seq[(Int, Int, Array[Byte])] =
          if (Gif.isGif(bytes)) {
            val (w, h, fs) = Gif.decodeRgbFrames(bytes)
            fs.map { case (_, rgb) => (w, h, rgb) }
          } else if (Avi.isAvi(bytes)) Avi.decodeFrames(bytes)
          else if (H264.isAnnexB(bytes)) H264.decodeFrames(bytes)
          else Nil
        frames.zipWithIndex.collect { case ((w, h, rgb), fi) if w >= 9 && h >= 8 =>
          Row(r.getLong(0), fi, dhash64(grayGrid(w, h, rgb, 9, 8)))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Closed-form frame-hash of the clip near-dup fixture: frame f of class
    * k dHashes to exactly (k·6 + f + 1)·2654435761 mod 2⁶⁴ (the raster
    * below walks each grid row ±8 per hash bit, so dHash recovers the
    * bits). The multiplier is odd ⇒ the map is injective mod 2⁶⁴ ⇒ every
    * (class, frame) fingerprint is DISTINCT, and clips share a fingerprint
    * iff they share a (class, frame) — cross-class shared counts are
    * exactly 0, within-class ≥ 5 of 6. */
  private[graft] def clipFrameHash(k: Long, f: Int): Long = (k * 6 + f + 1) * 2654435761L

  /** Clip near-dup fixture (q285's input): class k = id mod `classes` is a
    * 6-frame 32×32 picture sequence; variant v = (id div classes) mod 3
    * renders frames 0–5 as animated GIF (v=0), the SAME frames RE-ENCODED
    * as an H.264 I_PCM stream (v=1 — different container, byte-identical
    * rasters), or frames 1–5 as a TRIMMED GIF (v=2). Pixel (x,y) of frame
    * f replicates grid cell (y div 4, ⌊(9x+8)/32⌋) — the exact partition
    * [[grayGrid]] uses at 9×8 over 32×32 — so the decoded block means
    * recover the walk grid and dHash recovers [[clipFrameHash]]'s bits
    * through all three renderings. */
  def syntheticNearDupClips(df: DataFrame, idCol: String,
                            classes: Int = 41): DataFrame = {
    require(classes >= 1 && classes <= 41, s"classes=$classes")
    val gen = udf { (id: Long) =>
      val k = id % classes
      val v = (id / classes) % 3
      clipCache.computeIfAbsent((k, v), _ => {
        val fRange = if (v == 2L) 1 to 5 else 0 to 5
        val rasters = fRange.map { f =>
          val bits = clipFrameHash(k, f)
          val grid = Array.ofDim[Int](8, 9)
          var r = 0
          while (r < 8) {
            grid(r)(0) = 128
            var c = 0
            while (c < 8) {
              val up = ((bits >>> (r * 8 + c)) & 1L) == 1L
              grid(r)(c + 1) = grid(r)(c) + (if (up) 8 else -8)
              c += 1
            }
            r += 1
          }
          Array.tabulate(1024) { i =>
            val y = i / 32; val x = i % 32
            grid(y / 4)((9 * x + 8) / 32).toByte
          }
        }
        if (v == 1L) H264.encodeGrayPcm(32, 32, rasters)
        else {
          val pal = Array.tabulate(256)(j => (j << 16) | (j << 8) | j)
          Gif.encode(32, 32, pal,
            rasters.map(lu => Gif.EncFrame(0, 0, 32, 32, delayCs = 4, indices = lu)))
        }
      })
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("video").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("mixed").as("format"), lit(32).as("width"), lit(32).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }
  /** Per-executor payload memo for the clip fixture: 41 classes × 3
    * variants = 123 encoded clips, O(distinct) generation. */
  private val clipCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long), Array[Byte]]()

  /** Closed-form dHash target bit of the near-dup fixture (shared by the
    * generator, the spec, and — re-stated in SQL — the q275 oracle): base
    * pattern = bit r·8+c of k·2654435761 (Knuth's multiplicative constant;
    * distinct classes are ≥8 bits apart for k < 41, measured exhaustively),
    * and variant v flips the ≤3 positions (r=j, c=(k+j) mod 8) for j < v —
    * so within a class every pair is ≤3 apart while cross-class pairs stay
    * ≥8 apart: Hamming threshold 3 separates exactly. */
  private[multimodal] def nearDupBit(k: Long, v: Long, r: Int, c: Int): Boolean = {
    val base = ((k * 2654435761L) >>> (r * 8 + c) & 1L) == 1L
    val flip = r < v && c == ((k + r) % 8)
    base ^ flip
  }

  /** Near-duplicate image fixture (q275's input): class k = id mod
    * `classes` picks the base picture, variant v = (id div classes) mod
    * `variants` applies ≤3 one-bit edits, and the CONTAINER cycles
    * PPM/PNG/GIF by id mod 3. The 18×16 raster replicates each 9×8 grid
    * cell 2×2 with R=G=B, and each grid row walks from 128 by ±8 per
    * [[nearDupBit]] — so dHash(decode(bytes)) recovers the closed-form bit
    * pattern EXACTLY, and the DuckDB oracle can restate hash and clusters
    * relationally without seeing a byte. */
  def syntheticNearDupImages(df: DataFrame, idCol: String, classes: Int = 41,
                             variants: Int = 4): DataFrame = {
    require(classes >= 1 && classes <= 41 && variants >= 1 && variants <= 4,
      s"fixture separation is verified for classes<=41, variants<=4; " +
        s"got ($classes, $variants)")
    val gen = udf { (id: Long) =>
      val k = id % classes
      val v = (id / classes) % variants
      val gw = 9; val gh = 8; val w = 2 * gw; val h = 2 * gh
      val grid = new Array[Int](gw * gh)
      var r = 0
      while (r < gh) {
        grid(r * gw) = 128
        var c = 0
        while (c < gw - 1) {
          grid(r * gw + c + 1) = grid(r * gw + c) + (if (nearDupBit(k, v, r, c)) 8 else -8)
          c += 1
        }
        r += 1
      }
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = grid((y / 2) * gw + (x / 2)).toByte
          val p = 3 * (y * w + x)
          rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          x += 1
        }
        y += 1
      }
      (id % 3) match {
        case 0 => Codecs.encodePpm(w, h, rgb)
        case 1 => Codecs.encodePng(w, h, rgb)
        case _ =>
          val pal = Array.tabulate(256)(j => (j << 16) | (j << 8) | j)
          val idx = Array.tabulate(w * h)(i => rgb(3 * i))
          Gif.encode(w, h, pal, Seq(Gif.EncFrame(0, 0, w, h, 0, indices = idx)))
      }
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("mixed").as("format"), lit(18).as("width"), lit(16).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** Mixed-format image table (q186's input): pixel content is a closed form
    * of `id mod classes`, but the CONTAINER cycles PPM/PNG/GIF by `id mod 3`
    * — so byte-level hashing splits every pixel-identical cluster three ways
    * and only decode-normalized hashing reproduces the oracle clusters. */
  def syntheticMixedFormatImages(df: DataFrame, idCol: String, classes: Int = 41,
                                 w: Int = 8, h: Int = 8): DataFrame = {
    val gen = udf { (id: Long) =>
      val d = id % classes
      val idx = Array.tabulate(w * h)(i => ((d * 31 + i * 5) % 256).toByte)
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val j = idx(i) & 0xff
        rgb(3 * i) = j.toByte; rgb(3 * i + 1) = (2 * j % 256).toByte; rgb(3 * i + 2) = (3 * j % 256).toByte
        i += 1
      }
      (id % 3) match {
        case 0 => Codecs.encodePpm(w, h, rgb)
        case 1 => Codecs.encodePng(w, h, rgb)
        case _ =>
          val pal = Array.tabulate(256)(j => (j << 16) | ((2 * j % 256) << 8) | (3 * j % 256))
          Gif.encode(w, h, pal, Seq(Gif.EncFrame(0, 0, w, h, 0, indices = idx)))
      }
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("mixed").as("format"), lit(w).as("width"), lit(h).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
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

  /** Deterministic REAL-format media tables from any keyed corpus: payloads
    * are genuine 8×8 binary PPMs / 256-sample PCM16 WAVs whose pixel/sample
    * values are a closed-form function of the id — which is exactly what
    * makes the decoders ORACLE-CHECKABLE: DuckDB recomputes the same
    * statistics from the same closed form without ever seeing the bytes,
    * so the only way the engine matches is by decoding the format
    * correctly (q166/q167). Generation is a synthesis harness (UDF is
    * fine); DECODE is the operator under test.
    */
  def syntheticPpmFromIds(df: DataFrame, idCol: String, w: Int = 8, h: Int = 8): DataFrame = {
    val gen = udf { (id: Long) =>
      Codecs.encodePpm(w, h, Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte))
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("ppm").as("format"), lit(w).as("width"), lit(h).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** Same closed form as [[syntheticPpmFromIds]] but packaged as REAL PNG
    * (zlib scanlines, cycling filters, CRC'd chunks) — so q183 shares
    * q166's oracle: only a correct inflate + unfilter matches it. */
  def syntheticPngFromIds(df: DataFrame, idCol: String, w: Int = 8, h: Int = 8): DataFrame = {
    val gen = udf { (id: Long) =>
      Codecs.encodePng(w, h, Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte))
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("png").as("format"), lit(w).as("width"), lit(h).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** REAL baseline-JPEG media table (q184): 16x16 grayscale, four 8x8
    * blocks each UNIFORM at ((id*31 + b*7) % 256) — the uniform-block
    * exactness contract ([[Jpeg]] doc) makes the lossy format's decode
    * closed-form: DC-only blocks survive Huffman+quant+IDCT bit-exactly,
    * so DuckDB recomputes the channel sums without seeing a byte. */
  def syntheticJpegFromIds(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf { (id: Long) =>
      val gray = new Array[Byte](256)
      var i = 0
      while (i < 256) {
        val b = (i / 16 / 8) * 2 + (i % 16 / 8)
        gray(i) = ((id * 31 + b * 7) % 256).toByte
        i += 1
      }
      Jpeg.encodeGray(16, 16, gray)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("image").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("jpeg").as("format"), lit(16).as("width"), lit(16).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** REAL animated-GIF media table (q185): 4 interlaced full-canvas 8×8
    * frames per id. Palette j → (j, 2j mod 256, 3j mod 256); frame f's
    * pixel i gets index (id·31 + f·13 + i·5) mod 256; GCE delay
    * (id mod 100 + 7f + 1) cs — all closed forms, so DuckDB recomputes the
    * per-frame position-weighted channel statistics and presentation
    * timestamps without seeing a byte. Every frame is INTERLACED: the
    * weighted red sum only matches if all four deinterlace passes land rows
    * exactly where the encoder took them from. */
  def syntheticGifFromIds(df: DataFrame, idCol: String, nFrames: Int = 4,
                          w: Int = 8, h: Int = 8): DataFrame = {
    val gen = udf { (id: Long) =>
      val palette = Array.tabulate(256)(j => (j << 16) | ((2 * j % 256) << 8) | (3 * j % 256))
      val frames = (0 until nFrames).map { f =>
        Gif.EncFrame(0, 0, w, h, delayCs = (id % 100 + 7L * f + 1L).toInt,
          interlaced = true,
          indices = Array.tabulate(w * h)(i => ((id * 31 + f * 13 + i * 5) % 256).toByte))
      }
      Gif.encode(w, h, palette, frames, loop = true)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("video").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("gif").as("format"), lit(w).as("width"), lit(h).as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** REAL MJPEG-AVI media table (q187): 3 frames of 16×16 grayscale
    * baseline JPEG per id, each frame four UNIFORM 8×8 blocks at
    * ((id·31 + f·13 + b·7) mod 256) — the q184 exactness contract per
    * frame — in a spec-shaped RIFF/AVI container with stream timing
    * scale=1, rate ∈ {5,10,20,25} by id mod 4 (rates divide 1000, so
    * presentation timestamps are exact integer ms). */
  def syntheticAviFromIds(df: DataFrame, idCol: String, nFrames: Int = 3): DataFrame = {
    val rates = Array(5, 10, 20, 25)
    val gen = udf { (id: Long) =>
      val frames = (0 until nFrames).map { f =>
        val gray = new Array[Byte](256)
        var i = 0
        while (i < 256) {
          val b = (i / 16 / 8) * 2 + (i % 16 / 8)
          gray(i) = ((id * 31 + f * 13 + b * 7) % 256).toByte
          i += 1
        }
        Jpeg.encodeGray(16, 16, gray)
      }
      Avi.encodeMjpeg(16, 16, 1, rates((id % 4).toInt), frames)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("video").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("avi").as("format"), lit(16).as("width"), lit(16).as("height"),
        (lit(nFrames * 1000L) / element_at(lit(rates), (pmod(col(idCol), lit(4)) + 1).cast("int")))
          .cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  /** REAL H.264 media table (q245): 3 IDR frames of 32×32 (4 macroblocks)
    * per id as a baseline-profile Annex B I_PCM stream ([[H264.encodePcm]]
    * — genuine NAL framing, emulation prevention, Exp-Golomb headers).
    * Macroblock mb (raster, my·2+mx) of frame f is UNIFORM gray
    * ((id·31 + f·13 + mb·7) mod 256) with flat chroma, so R=G=B=Y exactly
    * and DuckDB recomputes per-frame channel sums AND the position-weighted
    * red sum (which pins MB raster placement) from the closed form without
    * seeing a byte — the q184/q187 exactness contract on the third real
    * video container. Values of 0..3 occur (id mod 256 cycles), so the
    * emulation-prevention path is exercised for real. */
  def syntheticH264FromIds(df: DataFrame, idCol: String, nFrames: Int = 3): DataFrame = {
    val gen = udf { (id: Long) =>
      val frames = (0 until nFrames).map { f =>
        val y = new Array[Byte](1024)
        var i = 0
        while (i < 1024) {
          val mb = (i / 32 / 16) * 2 + (i % 32 / 16)
          y(i) = ((id * 31 + f * 13 + mb * 7) % 256).toByte
          i += 1
        }
        y
      }
      H264.encodeGrayPcm(32, 32, frames)
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("video").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("h264").as("format"), lit(32).as("width"), lit(32).as("height"),
        lit(nFrames * 40L).as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
  }

  def syntheticWavFromIds(df: DataFrame, idCol: String, n: Int = 256,
                          sampleRate: Int = 16000): DataFrame = {
    val gen = udf { (id: Long) =>
      Codecs.encodeWavPcm16(sampleRate,
        Array.tabulate(n)(i => ((id * 13 + i * 11) % 2001 - 1000).toShort))
    }
    df.select(col(idCol).cast("long").as("media_id"), lit("audio").as("kind"),
      gen(col(idCol).cast("long")).as("bytes"),
      struct(lit("wav").as("format"), lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(n.toLong * 1000 / sampleRate).as("duration_ms"),
        lit(sampleRate).as("sample_rate")).as("meta"))
  }

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
