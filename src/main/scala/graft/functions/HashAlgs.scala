package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom expressions in [[HashExprs]].
  * Called from both interpreted eval and generated code (static forwarders),
  * so the hot path is identical either way: no boxing, no per-element lambda
  * dispatch — this replaced a higher-order-function pipeline that spent ~10µs
  * per element on interpreted lambda evaluation.
  *
  * Tokenization matches Java regex `\s+` exactly: ASCII space, \t, \n,
  * \x0B, \f, \r (UTF-8 multibyte units never collide with ASCII bytes).
  */
object HashAlgs {

  @inline private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** (start, end) byte offsets of whitespace-separated tokens. */
  private[functions] def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isSpace(bytes(i))) i += 1
        if (n == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(n) = s; ends(n) = i; n += 1
      }
    }
    (starts, ends, n)
  }

  /** xxhash64 of each word n-gram shingle (tokens joined by a single space),
    * seed 42. One pass over the text, one small reused buffer — no string
    * materialization.
    */
  def shingleHashes(text: UTF8String, n: Int, seed: Long): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    val nSh = nTok - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nSh)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nSh) {
      var blen = 0
      var j = 0
      while (j < n) {
        val s = starts(i + j); val e = ends(i + j)
        val need = blen + (e - s) + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(blen) = 0x20; blen += 1 }
        System.arraycopy(bytes, s, buf, blen, e - s)
        blen += e - s
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT word n-gram shingle STRINGS (tokens joined by one space), in
    * first-occurrence order — bit-identical to the HOF form
    * `array_distinct(transform(tokens, slice+array_join))` it replaced
    * (DedupSpec pins the equality): array_distinct keeps the first
    * occurrence, so does the HashSet guard here. One pass, one reused
    * buffer; the containment/Jaccard family calls this per document and
    * the interpreted-lambda version cost ~10 µs/element (the q255 tax).
    */
  def shingleSetStrings(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    val nSh = nTok - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[UTF8String](nSh * 2)
    val out = new java.util.ArrayList[AnyRef](nSh)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nSh) {
      var blen = 0
      var j = 0
      while (j < n) {
        val s = starts(i + j); val e = ends(i + j)
        val need = blen + (e - s) + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(blen) = 0x20; blen += 1 }
        System.arraycopy(bytes, s, buf, blen, e - s)
        blen += e - s
        j += 1
      }
      val sh = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen))
      if (seen.add(sh)) out.add(sh)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** MinHash signature: out(s) = min over h in hashes of the exact value the
    * BUILTIN `xxhash64(h, s)` produces on two BIGINT columns (chain: seed 42 →
    * hashLong(h) → hashLong(s)) — so the HOF form in
    * [[graft.dedup.Dedup.minhashSignature]] is bit-identical and the two are
    * differentially testable / mixable. The h-chain half is hoisted out of the
    * seed loop (one hashLong per element, not per element×seed).
    * Null for an empty input (mirrors array_min semantics — "no shingles"
    * must not collide with a real signature). Null ELEMENTS are rejected
    * loudly: getLong on a null slot would return undefined garbage.
    */
  def minhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val g = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException("minhash_signature: null element in shingle-hash array")
      g(i) = XXH64.hashLong(hashes.getLong(i), 42L)
      i += 1
    }
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = XXH64.hashLong(s.toLong, g(j))
        if (v < mn) mn = v
        j += 1
      }
      out(s) = mn
      s += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-family deterministic shingle hashes: the 28-bit prefix of
    * md5(word n-gram, tokens joined by one space) — bit-identical to
    * `conv(substring(md5(shingle), 1, 7), 16, 10)` over
    * Dedup.detShingleSet, minus the per-element string materialization and
    * interpreted lambda dispatch. Duplicate shingles are NOT deduped here:
    * every consumer folds the array with min, where duplicates are inert
    * (detShingleSet keeps array_distinct for the exact-Jaccard verify
    * path, which counts set elements). */
  def detShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    val nSh = nTok - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = md5Local.get()
    val out = new Array[Long](nSh)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < nSh) {
      var blen = 0
      var j = 0
      while (j < n) {
        val s = starts(i + j); val e = ends(i + j)
        val need = blen + (e - s) + 1
        if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(blen) = 0x20; blen += 1 }
        System.arraycopy(bytes, s, buf, blen, e - s)
        blen += e - s
        j += 1
      }
      md.reset()
      md.update(buf, 0, blen)
      val d = md.digest()
      // first 7 hex chars of the digest = the top 28 bits, big-endian
      out(i) = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic affine MinHash signature over 28-bit md5-derived token
    * hashes — bit-identical to graft.dedup.Dedup.detPerm's HOF form
    * (out(s) = min over h of ((2s+1)·65537·h + 40503·s + 7) mod 268435399,
    * DedupSpec pins the equivalence) but a tight k·n long loop instead of
    * k·n interpreted lambda evaluations: measured 10× on the q247 gate.
    * a·h ≤ 2^22·2^28 = 2^50 — no overflow. */
  def detMinhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException("det_minhash_signature: null element in hash array")
      h(i) = hashes.getLong(i)
      // the affine family's no-overflow guarantee (a·h ≤ 2^50) holds only
      // on the 28-bit domain — out-of-range input would wrap silently
      if (h(i) < 0L || h(i) >= 268435456L)
        throw new IllegalArgumentException(
          s"det_minhash_signature: hash ${h(i)} outside the 28-bit domain [0, 2^28)")
      i += 1
    }
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = (2L * s + 1L) * 65537L
      val b = 40503L * s + 7L
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * h(j) + b) % 268435399L
        if (v < mn) mn = v
        j += 1
      }
      out(s) = mn
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Robust-winnowing window selection (Schleimer et al., SIGMOD 2003)
    * over a k-gram hash array: for each length-`w` window emit the
    * window minimum with the RIGHTMOST position among ties, deduplicated
    * on (pos, fp) in first-occurrence order — bit-identical to the HOF
    * form (array_min + array_max-of-tied-positions per window) but a
    * single O(n) monotone-deque pass instead of O(n·w) interpreted
    * lambdas. Positions are 1-based (element_at convention), matching
    * the SQL oracle. Returns array<struct<pos:bigint, fp:bigint>>. */
  def winnowSelect(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    val nWin = n - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException("winnow_select: null element in hash array")
      h(i) = hashes.getLong(i)
      i += 1
    }
    // monotone deque of indices, values strictly increasing front→back;
    // popping `>=` on push makes the front the rightmost minimum of ties
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    // fp is a function of the selected index, so (pos, fp) dedup = pos dedup
    val emitted = new Array[Boolean](n)
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow](nWin)
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val minIdx = dq(head)
        if (!emitted(minIdx)) {
          emitted(minIdx) = true
          rows += org.apache.spark.sql.catalyst.InternalRow(
            (minIdx + 1).toLong, h(minIdx)) // 1-based position
        }
      }
      i += 1
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** Intersection size of two ascending-sorted long arrays (merge scan).
    * Duplicates are counted pairwise (inputs here are distinct sets).
    * Null elements are rejected loudly (getLong on a null slot is undefined). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException("sorted_intersect_size: null element in input array")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** 64-bit SimHash over whitespace tokens, hashing each token's byte span in
    * place (zero copies). Token hash = xxhash64(bytes, 42) — identical to
    * Spark's builtin xxhash64 on the token string.
    */
  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val (starts, ends, nTok) = tokenSpans(bytes)
    val counters = new Array[Int](64)
    var t = 0
    while (t < nTok) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(t), ends(t) - starts(t), 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}
