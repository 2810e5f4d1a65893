package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  * the third member of the subword family next to [[Bpe]] (frequency
  * argmax) and [[Unigram]] (likelihood DP). WordPiece is BPE's loop with a
  * LIKELIHOOD-GAIN objective: each round merges the adjacent symbol pair
  * (L, R) maximizing count(LR) / (count(L)·count(R)) — the corpus
  * log-likelihood delta of fusing the pair under a unigram symbol model —
  * and non-initial symbols carry the `##` continuation prefix, so the
  * learned vocabulary distinguishes word-initial from word-internal
  * pieces. Reference behavior: the reference stores tokenizer-normalized
  * text columns (SURVEY §2.8 F2's normalization family); the tokenizer
  * family itself is the training-data headroom SURVEY §2.9 prescribes.
  *
  * EXACTNESS. The argmax compares the rational scores by BigInt
  * cross-multiplication — c12_a·c1_b·c2_b vs c12_b·c1_a·c2_a — with ties
  * broken by the UTF-8 byte order of "L R" ([[Bpe.byteLess]]), so the
  * merge sequence is a pure deterministic function of the word-count
  * table and an external engine (DuckDB, HUGEINT arithmetic) reproduces
  * it bit-for-bit. No floats anywhere.
  *
  * SCALE. Training consumes the distinct-word weight table — the same
  * Heaps-law-bounded sufficient statistic every production trainer
  * (HuggingFace tokenizers, the original BERT code) collects first — so
  * the one corpus-scale job is the word count; the merge loop is
  * driver-side over ≤ maxVocab rows. The delta-maintained pair index of
  * [[Bpe.trainInMemory]] and the job-per-merge distributed fallback of
  * [[Bpe.learnMergesDistributed]] both apply unchanged (only the argmax
  * key differs); this implementation recounts per round, which is exact
  * and O(vocab·wordLen) per merge — the right trade at tokenizer vocab
  * sizes. Segmentation is a zero-shuffle projection
  * ([[graft.functions.WordPieceExprs]]): the vocabulary rides the plan.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** One learned merge: rank (1-based), the pair "L R", the fused symbol,
    * and the exact score numerator/denominator inputs (c12, c1, c2). */
  final case class Merge(rank: Long, pair: String, merged: String,
                         c12: Long, c1: Long, c2: Long)

  private def toSymbols(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    var first = true
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val c = new String(Character.toChars(cp))
      b += (if (first) c else "##" + c)
      first = false
      i += Character.charCount(cp)
    }
    b.result()
  }

  private def fuse(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** The trainer loop on a collected (word, weight) table. Each round:
    * weighted adjacent-pair counts (every adjacent position, like
    * [[Bpe.trainInMemory]]) and weighted symbol-occurrence counts; argmax
    * by exact rational score with byte-order tie-break; leftmost
    * non-overlapping rewrite. Stops early when no adjacent pairs remain
    * (every word fused to a single symbol). */
  def trainFromWords(vocab: Array[(String, Long)],
                     nMerges: Int): IndexedSeq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map { case (w, _) => toSymbols(w) }
    val weight = vocab.map(_._2)
    val out = mutable.ArrayBuffer.empty[Merge]
    var t = 1
    while (t <= nMerges) {
      val pairCount = mutable.HashMap.empty[(String, String), Long]
      val symCount = mutable.HashMap.empty[String, Long]
      var wi = 0
      while (wi < words.length) {
        val s = words(wi); val cnt = weight(wi)
        var i = 0
        while (i < s.length) {
          symCount.update(s(i), symCount.getOrElse(s(i), 0L) + cnt)
          if (i + 1 < s.length) {
            val p = (s(i), s(i + 1))
            pairCount.update(p, pairCount.getOrElse(p, 0L) + cnt)
          }
          i += 1
        }
        wi += 1
      }
      if (pairCount.isEmpty) return out.toIndexedSeq
      var best: ((String, String), Long, Long, Long) = null
      for ((p @ (l, r), c12) <- pairCount) {
        val c1 = symCount(l); val c2 = symCount(r)
        if (best == null) best = (p, c12, c1, c2)
        else {
          // score(p) vs score(best): cross-multiply exactly in BigInt
          val a = BigInt(c12) * best._3 * best._4
          val b = BigInt(best._2) * c1 * c2
          val key = l + " " + r
          val bestKey = best._1._1 + " " + best._1._2
          if (a > b || (a == b && Bpe.byteLess(key, bestKey)))
            best = (p, c12, c1, c2)
        }
      }
      val ((l, r), c12, c1, c2) = best
      val mrg = fuse(l, r)
      out += Merge(t.toLong, l + " " + r, mrg, c12, c1, c2)
      wi = 0
      while (wi < words.length) {
        val s = words(wi)
        var has = false
        var i = 0
        while (i + 1 < s.length && !has) {
          if (s(i) == l && s(i + 1) == r) has = true
          i += 1
        }
        if (has) {
          val ns = mutable.ArrayBuffer.empty[String]
          i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              ns += mrg; i += 2
            } else { ns += s(i); i += 1 }
          }
          words(wi) = ns.toArray
        }
        wi += 1
      }
      t += 1
    }
    out.toIndexedSeq
  }

  /** TRAIN: one corpus-scale Spark job (the distinct-word weight count),
    * then the driver loop. Same collect bound discipline as
    * [[Bpe.learnMerges]]: limit(maxVocab+1) caps the driver pull itself.
    * Returns (rank, pair, merged, c12, c1, c2) — the integer score inputs
    * pin the argmax in the result hash. */
  def learn(docs: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges >= 1 && nMerges <= (1 << 16), s"learn: nMerges=$nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = wordWeights(docs, textCol, maxVocab)
    trainFromWords(vocab, nMerges)
      .map(m => (m.rank, m.pair, m.merged, m.c12, m.c1, m.c2))
      .toSeq.toDF("rank", "pair", "merged", "c12", "c1", "c2")
  }

  /** The shared sufficient statistic: (distinct word, weight), driver
    * collect bounded by maxVocab. */
  def wordWeights(docs: DataFrame, textCol: String,
                  maxVocab: Int = 1 << 20): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .limit(maxVocab + 1)
      .as[(String, Long)].collect()
    require(vocab.length <= maxVocab,
      s"wordWeights: distinct words exceed maxVocab=$maxVocab — " +
        "apply a frequency floor first")
    vocab
  }

  /** The segmentation vocabulary a training run yields: every initial
    * symbol of the training words (word-initial chars plus ##-prefixed
    * continuation chars) plus every merged symbol, in first-seen order. */
  def vocabOf(words: Array[(String, Long)], merges: Seq[Merge]): Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    for ((w, _) <- words; s <- toSymbols(w)) seen.add(s)
    for (m <- merges) seen.add(m.merged)
    seen.toArray(new Array[String](0))
  }

  /** Greedy longest-match-first segmentation (the BERT runtime algorithm):
    * at each position take the LONGEST vocabulary piece matching the
    * remaining suffix (##-prefixed when not word-initial); any position
    * with no match makes the whole word a single [[Unk]]. Deterministic —
    * no scores, just set membership. */
  def segment(word: String, vocab: java.util.HashSet[String],
              maxPieceChars: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val out = Array.newBuilder[String]
    var i = 0
    while (i < n) {
      val prefix = if (i == 0) "" else "##"
      var j = math.min(n, i + maxPieceChars)
      var hit: String = null
      while (hit == null && j > i) {
        val cand = prefix + word.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      i = j
    }
    out.result()
  }
}
