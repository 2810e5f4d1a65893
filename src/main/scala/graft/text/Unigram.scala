package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LANGUAGE-MODEL TOKENIZER (Kudo, "Subword Regularization",
  * ACL 2018 — the SentencePiece-unigram algorithm behind T5/ALBERT-style
  * vocabularies; public arXiv 1804.10959), distributed and ENGINE-EXACT.
  *
  * The other of the two production tokenizer families next to [[Bpe]]:
  * instead of growing a vocabulary by greedy merges, unigram-LM starts
  * from a LARGE seed vocabulary of substrings and lets EM re-estimate
  * piece probabilities, segmenting each word by the Viterbi-best product
  * of piece probabilities. TWO E-steps are implemented: the deterministic
  * HARD-EM variant (Viterbi counts — the shipped default, used by
  * [[train]] and the q260-q262 family) and the paper-faithful SOFT-EM
  * variant (forward-backward expected counts over ALL segmentations,
  * Kudo 2018 §3.2 — [[trainSoft]]/[[softEmRound]], determinized by
  * exact-integer lattice weights and Q16-floor posteriors; see the
  * soft-EM section below). Both run ADD-ONE smoothing on a FIXED seed
  * piece set:
  *
  *  - seed: every single code point of the corpus, plus the top
  *    (maxVocab − #singles) multi-code-point substrings of length
  *    ≤ maxPieceLen ranked by weighted occurrence count
  *    (weight DESC, piece ASC in UTF-8 byte order);
  *  - E-step: each distinct word is segmented by Viterbi under
  *    p(piece) = cnt(piece)/T; M-step: cnt'(p) = 1 + Σ_w freq(w) ·
  *    (occurrences of p on w's best path). The +1 keeps every seeded
  *    piece alive (no zero-probability lock-in), so the piece set never
  *    shrinks and every word stays segmentable.
  *
  * Determinism contract (what earns the hash-exact oracle): Viterbi
  * maximizes Σ splg(piece) where splg = fixedLog2Q16(cnt) −
  * fixedLog2Q16(T) — a Q16 FIXED-POINT log2 computed by an integer
  * bit-squaring recurrence (see [[fixedLog2Q16]]) that any engine
  * reproduces bit-for-bit in 64-bit integer arithmetic. No floating
  * point anywhere, no overflow at any corpus scale (counts < 2^53).
  * Ties break by fewer pieces, then the smaller cut-position mask
  * (LSB = cut after the first code point) — the same total order a
  * brute-force enumeration sorted by (score DESC, k ASC, mask ASC)
  * yields, which is exactly how the DuckDB oracle recomputes it and how
  * UnigramSpec's exhaustive-enumeration differential pins the DP.
  *
  * Scale shape (the [[Bpe.learnMerges]] precedent): the ONLY corpus-sized
  * job is the initial distinct-word weight count; seeding and the EM
  * rounds run on the Heaps-law-bounded word table — driver-side under
  * `maxWords` (the same in-memory word-count table SentencePiece itself
  * trains from), or cluster-side via [[emRoundDistributed]] when the
  * vocabulary outgrows the driver (O(1) jobs per round). Corpus
  * segmentation ([[graft.functions.UnigramExprs]]) is a ZERO-SHUFFLE
  * projection with the executor-resident model — the plan a 100 TB
  * tokenization wants.
  */
object Unigram {

  /** Q16 fixed-point log2 of a positive integer: floor(log2 x)·2^16 plus
    * 16 fraction bits extracted by the classic normalize-and-square
    * recurrence — mantissa m kept in [2^16, 2^17), each step m ← m²>>16,
    * emitting a 1 and halving when m² crosses 2 (m² >> 16 ≥ 2^17). All
    * intermediates fit 64-bit (m² < 2^36), truncation is deterministic,
    * and the result is within ~1e-4 of true log2 — accuracy only shapes
    * the quantized objective, never cross-engine agreement. */
  def fixedLog2Q16(x: Long): Long = {
    require(x >= 1, s"fixedLog2Q16: need x >= 1, got $x")
    val fl = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (fl >= 16) x >>> (fl - 16) else x << (16 - fl)
    var acc = 0L
    var i = 0
    while (i < 16) {
      val m2 = (m * m) >> 16
      if (m2 >= 131072L) { acc = acc * 2 + 1; m = m2 >> 1 }
      else { acc = acc * 2; m = m2 }
      i += 1
    }
    fl.toLong * 65536L + acc
  }

  /** UTF-8 unsigned-byte order — the engine-portable piece tie-break
    * (Spark UTF8String / any binary collation; [[Bpe]] uses the same). */
  private[text] def byteLess(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Trained model: parallel (piece, count) arrays, piece set fixed at
    * seeding. `total` = Σ counts is the probability denominator. */
  case class Model(pieces: Array[String], counts: Array[Long]) {
    require(pieces.length == counts.length && pieces.nonEmpty, "Unigram.Model: empty")
    val total: Long = counts.sum
    /** piece → Q16 log2 p(piece); the unknown-code-point fallback scores
      * as count 1 (the add-one floor): splg = 0 − fixedLog2Q16(total). */
    def splgMap: java.util.HashMap[String, java.lang.Long] = {
      val lgT = fixedLog2Q16(total)
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), java.lang.Long.valueOf(fixedLog2Q16(counts(i)) - lgT)); i += 1 }
      m
    }
    def unkSplg: Long = -fixedLog2Q16(total)
    def maxPieceLen: Int = {
      var mx = 1
      var i = 0
      while (i < pieces.length) {
        val n = pieces(i).codePointCount(0, pieces(i).length)
        if (n > mx) mx = n
        i += 1
      }
      mx
    }
  }

  /** Viterbi-best segmentation of `word` (given as code points) under the
    * Q16 quantized objective: maximize Σ splg over pieces of length
    * ≤ maxPieceLen, ties → fewer pieces, then smaller cut mask. Multi-
    * code-point pieces must be in the vocabulary; an out-of-vocabulary
    * SINGLE code point falls back to `unkSplg` as its own piece, so every
    * word segments. Returns piece strings in order.
    *
    * The cut-mask tie-break is resolved without materializing masks: on
    * an exact (score, k) tie the two candidate paths' cut sets are
    * reconstructed from backpointers and compared highest-position-first
    * (no cut < cut), which IS integer mask comparison for any word length
    * — no 63-code-point cap, no big integers on the hot path. */
  def viterbi(cp: Array[Int], splg: java.util.HashMap[String, java.lang.Long],
              unkSplg: Long, maxPieceLen: Int): Array[String] = {
    val n = cp.length
    if (n == 0) return Array.empty
    val NEG = Long.MinValue / 4
    val score = new Array[Long](n + 1)
    val k = new Array[Int](n + 1)
    val bp = new Array[Int](n + 1) // start position of the piece ending at j
    java.util.Arrays.fill(score, NEG)
    score(0) = 0L; k(0) = 0; bp(0) = -1
    // cuts of the partial path to position j, highest-first on demand
    def cutsOf(j: Int): List[Int] = {
      var cs = List.empty[Int]
      var p = j
      while (p > 0) { val s = bp(p); if (s > 0) cs = s :: cs; p = s }
      cs // ascending cut positions (internal only)
    }
    // candidate (via piece [i, j)) beats incumbent at j?
    def better(j: Int, i: Int, cScore: Long): Boolean = {
      if (score(j) == NEG) return true
      if (cScore != score(j)) return cScore > score(j)
      val cK = k(i) + 1
      if (cK != k(j)) return cK < k(j)
      // exact (score, k) tie: compare cut masks, highest bit first
      val cCuts = (if (i > 0) (cutsOf(i) :+ i) else cutsOf(i)).reverse
      val iCuts = cutsOf(j).reverse
      var a = cCuts; var b = iCuts
      while (a.nonEmpty && b.nonEmpty) {
        if (a.head != b.head) return a.head < b.head // higher set bit = larger mask
        a = a.tail; b = b.tail
      }
      a.isEmpty && b.nonEmpty // fewer high cuts left = smaller mask; full tie keeps incumbent
    }
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (score(i) != NEG) {
          val piece = new String(cp, i, j - i)
          val w = splg.get(piece)
          val sp =
            if (w != null) w.longValue
            else if (j - i == 1) unkSplg
            else NEG
          if (sp != NEG) {
            val cScore = score(i) + sp
            if (better(j, i, cScore)) { score(j) = cScore; k(j) = k(i) + 1; bp(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    // reconstruct
    var out = List.empty[String]
    var p = n
    while (p > 0) { val s = bp(p); out = new String(cp, s, p - s) :: out; p = s }
    out.toArray
  }

  def viterbi(word: String, splg: java.util.HashMap[String, java.lang.Long],
              unkSplg: Long, maxPieceLen: Int): Array[String] =
    viterbi(word.codePoints().toArray, splg, unkSplg, maxPieceLen)

  /** The Viterbi-best SCORE (Σ splg) of `word`, optionally with one piece
    * EXCLUDED from the vocabulary entirely (no unknown-piece fallback for
    * it — the SentencePiece prune asks "how well does the rest of the
    * vocabulary segment this word?"). `excluded` must be a multi-code-
    * point piece, so the all-singles segmentation always survives and a
    * score always exists. Kept separate from [[viterbi]]: the prune loop
    * needs only scores, and the exclusion must not disturb the
    * segmentation path's tie-break contract. */
  def viterbiScore(cp: Array[Int], splg: java.util.HashMap[String, java.lang.Long],
                   unkSplg: Long, maxPieceLen: Int, excluded: String = null): Long = {
    require(excluded == null || excluded.codePointCount(0, excluded.length) > 1,
      s"viterbiScore: excluded piece must be multi-code-point, got '$excluded'")
    val n = cp.length
    if (n == 0) return 0L
    val NEG = Long.MinValue / 4
    val score = new Array[Long](n + 1)
    java.util.Arrays.fill(score, NEG)
    score(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (score(i) != NEG) {
          val piece = new String(cp, i, j - i)
          if (excluded == null || piece != excluded) {
            val w = splg.get(piece)
            val sp =
              if (w != null) w.longValue
              else if (j - i == 1) unkSplg
              else NEG
            if (sp != NEG && score(i) + sp > score(j)) score(j) = score(i) + sp
          }
        }
        i += 1
      }
      j += 1
    }
    score(n)
  }

  /** PRUNE IMPORTANCE (the SentencePiece outer-loop statistic, hard-EM
    * form): for every multi-code-point piece, the total corpus score
    * sacrificed if it were removed — Σ_w freq(w) · (bestScore(w) −
    * bestScoreWithout(w, p)) over the words whose Viterbi-best path uses
    * p (words not using p contribute exactly 0, so only path pieces are
    * probed). Always ≥ 0; a piece on no best path has importance 0 and is
    * pruned first. Single code points are never candidates — they are
    * the segmentability floor. */
  def pruneLosses(words: Array[(String, Long)], model: Model): Map[String, Long] = {
    val splg = model.splgMap
    val unk = model.unkSplg
    val maxLen = model.maxPieceLen
    val loss = new java.util.HashMap[String, java.lang.Long]()
    for ((w, f) <- words) {
      val cp = w.codePoints().toArray
      val seg = viterbi(cp, splg, unk, maxLen)
      lazy val best = viterbiScore(cp, splg, unk, maxLen)
      for (p <- seg.distinct if p.codePointCount(0, p.length) > 1) {
        val alt = viterbiScore(cp, splg, unk, maxLen, excluded = p)
        val prev = loss.get(p)
        loss.put(p, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue) + f * (best - alt)))
      }
    }
    import scala.jdk.CollectionConverters._
    loss.asScala.map { case (k, v) => (k, v.longValue) }.toMap
  }

  /** [[pruneLosses]] CLUSTER-SIDE — the headroom twin (same shape as
    * [[emRoundDistributed]]): per-word probes are independent, partial
    * losses sum order-free, bit-identical to the driver pass. */
  def pruneLossesDistributed(words: DataFrame, wordCol: String, freqCol: String,
                             model: Model): Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    words.select(col(wordCol).as[String], col(freqCol).as[Long])
      .mapPartitions { it =>
        val m = bc.value
        val splg = m.splgMap
        val unk = m.unkSplg
        val maxLen = m.maxPieceLen
        it.flatMap { case (w, f) =>
          val cp = w.codePoints().toArray
          val seg = viterbi(cp, splg, unk, maxLen)
          val multis = seg.distinct.filter(p => p.codePointCount(0, p.length) > 1)
          if (multis.isEmpty) Iterator.empty
          else {
            val best = viterbiScore(cp, splg, unk, maxLen)
            multis.iterator.map(p =>
              (p, f * (best - viterbiScore(cp, splg, unk, maxLen, excluded = p))))
          }
        }
      }
      .toDF("piece", "loss")
      .groupBy("piece").agg(sum("loss").as("loss"))
      .as[(String, Long)].collect().toMap
  }

  /** The prune verdict table: every vocabulary piece with its final count,
    * importance, and whether it survives a prune of the `nPrune`
    * least-important multi-code-point pieces (importance ASC, piece ASC
    * byte order — total, engine-portable). Singles always survive. */
  def pruneTable(words: Array[(String, Long)], model: Model,
                 nPrune: Int): Array[(String, Long, Long, Boolean)] = {
    val losses = pruneLosses(words, model)
    def isMulti(p: String): Boolean = p.codePointCount(0, p.length) > 1
    val pruned = model.pieces.filter(isMulti)
      .map(p => (p, losses.getOrElse(p, 0L)))
      .sortWith((a, b) => if (a._2 != b._2) a._2 < b._2 else byteLess(a._1, b._1))
      .take(nPrune).map(_._1).toSet
    model.pieces.zip(model.counts).map { case (p, c) =>
      (p, c, if (isMulti(p)) losses.getOrElse(p, 0L) else 0L, !pruned.contains(p))
    }
  }

  /** Seed vocabulary from a (word, freq) table: all single code points,
    * plus the top (maxVocab − #singles) longer substrings (length ≤
    * maxPieceLen) by (Σ freq over occurrence POSITIONS desc, piece asc
    * byte order). Seed counts are those occurrence weights. */
  def seedVocab(words: Array[(String, Long)], maxPieceLen: Int,
                maxVocab: Int): Array[(String, Long)] = {
    require(maxPieceLen >= 2, s"seedVocab: maxPieceLen=$maxPieceLen")
    val wt = new java.util.HashMap[String, java.lang.Long]()
    for ((w, f) <- words) {
      val cp = w.codePoints().toArray
      var i = 0
      while (i < cp.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= cp.length) {
          val p = new String(cp, i, l)
          val prev = wt.get(p)
          wt.put(p, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue) + f))
          l += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val all = wt.asScala.map { case (k, v) => (k, v.longValue) }.toArray
    def cpLen(s: String): Int = s.codePointCount(0, s.length)
    val singles = all.filter(p => cpLen(p._1) == 1)
    require(singles.length < maxVocab,
      s"seedVocab: ${singles.length} single code points fill maxVocab=$maxVocab")
    val multis = all.filter(p => cpLen(p._1) > 1)
      .sortWith((a, b) => if (a._2 != b._2) a._2 > b._2 else byteLess(a._1, b._1))
      .take(maxVocab - singles.length)
    singles ++ multis
  }

  /** One hard-EM round on the collected word table: Viterbi-segment every
    * word under `model`, recount with add-one smoothing. The piece set is
    * FIXED — only counts move. Shared by [[train]]'s driver loop and the
    * spec differentials. */
  def emRound(words: Array[(String, Long)], model: Model): Model = {
    val splg = model.splgMap
    val unk = model.unkSplg
    val maxLen = model.maxPieceLen
    val idx = new java.util.HashMap[String, Integer](model.pieces.length * 2)
    var i = 0
    while (i < model.pieces.length) { idx.put(model.pieces(i), Integer.valueOf(i)); i += 1 }
    val newCounts = Array.fill(model.pieces.length)(1L)
    for ((w, f) <- words) {
      val seg = viterbi(w, splg, unk, maxLen)
      for (p <- seg) {
        val j = idx.get(p)
        if (j != null) newCounts(j.intValue) += f
        // unk fallback pieces are not in the fixed set — they carry no count
      }
    }
    Model(model.pieces, newCounts)
  }

  /** One hard-EM round CLUSTER-SIDE — the headroom twin of [[emRound]]
    * for vocabularies too large to collect (same contract as
    * [[Bpe.learnMergesDistributed]]): the model broadcasts (a tokenizer
    * vocabulary is megabytes at 256k pieces), each partition segments its
    * words and emits (piece, freq), one aggregation sums, and only the
    * VOCAB-sized count table returns. Integer sums are order-free, so the
    * result is bit-identical to the driver round (UnigramSpec pins it). */
  def emRoundDistributed(words: DataFrame, wordCol: String, freqCol: String,
                         model: Model): Model = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val counted = words.select(col(wordCol).as[String], col(freqCol).as[Long])
      .mapPartitions { it =>
        val m = bc.value
        val splg = m.splgMap
        val unk = m.unkSplg
        val maxLen = m.maxPieceLen
        it.flatMap { case (w, f) => viterbi(w, splg, unk, maxLen).iterator.map(p => (p, f)) }
      }
      .toDF("piece", "freq")
      // Same overflow discipline as softEmRoundDistributed: DECIMAL sum +
      // exact narrowing, matching the driver twin's addExact loudness.
      .groupBy("piece").agg(sum(col("freq").cast("decimal(38,0)")).as("cnt"))
      .as[(String, java.math.BigDecimal)].collect()
      .map { case (p, s) => (p, s.toBigIntegerExact.longValueExact()) }.toMap
    Model(model.pieces, model.pieces.map(p => 1L + counted.getOrElse(p, 0L)))
  }

  /** The ONE corpus-scale job: distinct-word weights, collected under the
    * `maxWords` driver bound (the [[Bpe.learnMerges]] contract — Heaps'
    * law keeps a 100 TB web corpus in the tens of millions; beyond it,
    * pre-floor the tail or run the Distributed round twins). */
  def wordWeights(docs: DataFrame, textCol: String,
                  maxWords: Int = 1 << 20): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .limit(maxWords + 1)
      .as[(String, Long)].collect()
    require(words.length <= maxWords,
      s"wordWeights: distinct words exceed maxWords=$maxWords — " +
        "apply a frequency floor or run the Distributed round twins")
    require(words.nonEmpty, "wordWeights: corpus has no words")
    words
  }

  /** Seed + `emRounds` hard-EM rounds over a collected word table. */
  def trainFromWords(words: Array[(String, Long)], maxPieceLen: Int,
                     maxVocab: Int, emRounds: Int): Model = {
    require(emRounds >= 0 && emRounds <= 64, s"train: emRounds=$emRounds")
    val seed = seedVocab(words, maxPieceLen, maxVocab)
    var model = Model(seed.map(_._1), seed.map(_._2))
    var r = 0
    while (r < emRounds) { model = emRound(words, model); r += 1 }
    model
  }

  /** TRAIN: one corpus-scale Spark job (the distinct-word weight count),
    * then seed + `emRounds` hard-EM rounds driver-side over the
    * Heaps-bounded word table. */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int, maxVocab: Int,
            emRounds: Int, maxWords: Int = 1 << 20): Model =
    trainFromWords(wordWeights(docs, textCol, maxWords), maxPieceLen, maxVocab, emRounds)

  /** The trained vocabulary as a DataFrame (piece, cnt) — the query
    * surface for the hash-exact oracle. */
  def vocabDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.zip(model.counts).toSeq.toDF("piece", "cnt")
  }

  // ───────────────────────── SOFT-EM (forward-backward) ─────────────────────────
  // The paper-faithful E-step (Kudo 2018 §3.2 / SentencePiece's trainer):
  // expected piece counts over ALL segmentations of each word, not just the
  // Viterbi-best path. Determinized by the repo's fixed-point discipline so
  // the round is ENGINE-EXACT:
  //   1. model probabilities quantize to Q12 weights q(p) = 1 + ⌊cnt·2¹²/T⌋
  //      (the +1 is the add-one floor in Q12 units — no piece's lattice edge
  //      vanishes);
  //   2. a segmentation's weight is the exact INTEGER
  //      ∏ q(pᵢ) · 2^(12·(n−k)) (n code points, k pieces — each piece of
  //      length L pads 2^(12·(L−1)), so all paths share denominator 2^(12n));
  //   3. per-word posteriors quantize to Q16: e(w,p) = ⌊2¹⁶·S(w,p)/T(w)⌋
  //      where S sums path-weight × multiplicity over the lattice and
  //      T(w) = Σ path weights — exact BigInt forward-backward;
  //   4. M-step: cnt′(p) = 2¹⁶ + Σ_w freq(w)·e(w,p) — an order-free integer
  //      sum (2¹⁶ is add-one in Q16 units), so driver and distributed rounds
  //      are bit-identical.
  // The DuckDB oracle replays the round by BRUTE-FORCE path enumeration
  // (all 2^(n−1) cut masks, exact HUGEINT path weights), so the hash proves
  // the forward-backward DP itself. HUGEINT bounds the ORACLE to words of
  // ≤ 9 code points (weights ≤ 2^(12n)·1.01, sums ≤ 2^(12n+7), ×2¹⁶ fits
  // 2¹²⁷ for n ≤ 9); the Scala side is BigInt — unbounded.

  /** Q12 lattice weights of `model` (step 1 above). Guarded: quantization
    * needs cnt·2¹² in a Long — rescale counts past 2⁵¹ total. */
  def softQ12(model: Model): java.util.HashMap[String, java.lang.Long] = {
    require(model.total <= (Long.MaxValue >> 12),
      s"softQ12: Σ counts = ${model.total} exceeds the Q12 envelope (2^51) — pre-scale counts")
    val m = new java.util.HashMap[String, java.lang.Long](model.pieces.length * 2)
    var i = 0
    while (i < model.pieces.length) {
      m.put(model.pieces(i), java.lang.Long.valueOf(1L + model.counts(i) * 4096L / model.total))
      i += 1
    }
    m
  }

  /** Exact forward-backward over one word's segmentation lattice (steps
    * 2-3): Q16-floor expected counts per piece. Lattice edges are IN-VOCAB
    * pieces only (during training every single code point is seeded, so
    * every corpus word has a path; a word with none — possible only under
    * a foreign vocabulary — contributes nothing, exactly like its empty
    * mask set in the oracle). Returns (piece, e) with e = ⌊2¹⁶·S/T⌋. */
  def softExpectedCountsQ16(cp: Array[Int], q12: java.util.HashMap[String, java.lang.Long],
                            maxPieceLen: Int): Iterator[(String, Long)] = {
    val n = cp.length
    if (n == 0) return Iterator.empty
    def factor(i: Int, j: Int): BigInt = {
      val q = q12.get(new String(cp, i, j - i))
      if (q == null) null else BigInt(q.longValue) << (12 * (j - i - 1))
    }
    val alpha = Array.fill(n + 1)(BigInt(0)); alpha(0) = BigInt(1)
    var j = 1
    while (j <= n) {
      var acc = BigInt(0)
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (alpha(i).signum != 0) {
          val f = factor(i, j)
          if (f != null) acc += alpha(i) * f
        }
        i += 1
      }
      alpha(j) = acc
      j += 1
    }
    val tw = alpha(n)
    if (tw.signum == 0) return Iterator.empty
    val beta = Array.fill(n + 1)(BigInt(0)); beta(n) = BigInt(1)
    var i0 = n - 1
    while (i0 >= 0) {
      var acc = BigInt(0)
      var j2 = i0 + 1
      val jmax = math.min(n, i0 + maxPieceLen)
      while (j2 <= jmax) {
        if (beta(j2).signum != 0) {
          val f = factor(i0, j2)
          if (f != null) acc += f * beta(j2)
        }
        j2 += 1
      }
      beta(i0) = acc
      i0 -= 1
    }
    // edge (i,j): posterior mass α(i)·f·β(j); Σ over edges of a piece
    // = Σ_paths weight × multiplicity — the standard lattice identity.
    val s = new java.util.HashMap[String, BigInt]()
    var i = 0
    while (i < n) {
      if (alpha(i).signum != 0) {
        var j3 = i + 1
        val jmax = math.min(n, i + maxPieceLen)
        while (j3 <= jmax) {
          if (beta(j3).signum != 0) {
            val f = factor(i, j3)
            if (f != null) {
              val m = alpha(i) * f * beta(j3)
              val p = new String(cp, i, j3 - i)
              val prev = s.get(p)
              s.put(p, if (prev == null) m else prev + m)
            }
          }
          j3 += 1
        }
      }
      i += 1
    }
    import scala.jdk.CollectionConverters._
    s.entrySet().iterator().asScala.map(e => (e.getKey, ((e.getValue << 16) / tw).toLong))
  }

  /** One soft-EM round on the collected word table (step 4). The piece set
    * is FIXED — only counts move, now in Q16 expected-count units (only
    * ratios enter the next round's quantization, so units are free).
    * Overflow-loud: the accumulate uses exact Long arithmetic. */
  def softEmRound(words: Array[(String, Long)], model: Model): Model = {
    val q12 = softQ12(model)
    val maxLen = model.maxPieceLen
    val idx = new java.util.HashMap[String, Integer](model.pieces.length * 2)
    var i = 0
    while (i < model.pieces.length) { idx.put(model.pieces(i), Integer.valueOf(i)); i += 1 }
    val acc = new Array[Long](model.pieces.length)
    for ((w, f) <- words) {
      softExpectedCountsQ16(w.codePoints().toArray, q12, maxLen).foreach { case (p, e) =>
        val j = idx.get(p)
        if (j != null) acc(j.intValue) = Math.addExact(acc(j.intValue), Math.multiplyExact(f, e))
      }
    }
    Model(model.pieces, acc.map(65536L + _))
  }

  /** One soft-EM round CLUSTER-SIDE — the [[emRoundDistributed]] twin: the
    * Q12 model broadcasts, each partition runs the forward-backward on its
    * words and emits (piece, freq·e), one aggregation sums. Integer sums
    * are order-free ⇒ bit-identical to the driver round (UnigramSpec). */
  def softEmRoundDistributed(words: DataFrame, wordCol: String, freqCol: String,
                             model: Model): Model = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((softQ12(model), model.maxPieceLen))
    val counted = words.select(col(wordCol).as[String], col(freqCol).as[Long])
      .mapPartitions { it =>
        val (q12, maxLen) = bc.value
        it.flatMap { case (w, f) =>
          softExpectedCountsQ16(w.codePoints().toArray, q12, maxLen)
            .map { case (p, e) => (p, Math.multiplyExact(f, e)) }
        }
      }
      .toDF("piece", "fe")
      // Spark's Long sum wraps silently; the driver twin uses addExact.
      // Aggregate in DECIMAL(38,0) and narrow with longValueExact so an
      // overflow diverges LOUDLY here too, never silently from the twin.
      .groupBy("piece").agg(sum(col("fe").cast("decimal(38,0)")).as("s"))
      .as[(String, java.math.BigDecimal)].collect()
      .map { case (p, s) => (p, s.toBigIntegerExact.longValueExact()) }.toMap
    Model(model.pieces, model.pieces.map(p => 65536L + counted.getOrElse(p, 0L)))
  }

  /** TRAIN, soft-EM variant: one corpus-scale job (the distinct-word
    * weight count), then seed + `softRounds` forward-backward rounds
    * driver-side over the Heaps-bounded word table — the same scale shape
    * as [[train]], with [[softEmRoundDistributed]] as the cluster-side
    * headroom twin. */
  def trainSoft(docs: DataFrame, textCol: String, maxPieceLen: Int, maxVocab: Int,
                softRounds: Int, maxWords: Int = 1 << 20): Model = {
    require(softRounds >= 0 && softRounds <= 64, s"trainSoft: softRounds=$softRounds")
    val words = wordWeights(docs, textCol, maxWords)
    val seed = seedVocab(words, maxPieceLen, maxVocab)
    var model = Model(seed.map(_._1), seed.map(_._2))
    var r = 0
    while (r < softRounds) { model = softEmRound(words, model); r += 1 }
    model
  }
}
