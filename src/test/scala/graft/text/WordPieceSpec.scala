package graft.text

import graft.SparkSpec
import graft.functions.WordPieceExprs
import org.apache.spark.sql.functions._

/** WordPiece: hand-computed merge sequences (likelihood argmax, rational
  * tie-breaks, ## fusion), overlap/rewrite semantics, early stop, greedy
  * longest-match segmentation incl. the [UNK] collapse, and the
  * zero-shuffle expression bit-checked against the driver-side segmenter.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // aab ×2, ab ×3 — three rounds, two of them score TIES resolved by the
  // UTF-8 byte order of "L R" ('#' 0x23 < 'a' 0x61):
  //   r1: (a,##a)=2/(5·2) ties (##a,##b)=2/(2·5) → "##a ##b" wins → ##ab
  //   r2: (a,##ab)=2/(5·2) ties (a,##b)=3/(5·3) → "a ##ab" wins → aab
  //   r3: (a,##b)=3/(3·3) alone → ab; r4: no pairs → stop
  private val words = Array(("aab", 2L), ("ab", 3L))

  test("trainFromWords: hand-traced merges, rational tie-breaks, early stop") {
    val ms = WordPiece.trainFromWords(words, nMerges = 64)
    assert(ms.map(m => (m.rank, m.pair, m.merged, m.c12, m.c1, m.c2)) == IndexedSeq(
      (1L, "##a ##b", "##ab", 2L, 2L, 5L),
      (2L, "a ##ab", "aab", 2L, 5L, 2L),
      (3L, "a ##b", "ab", 3L, 3L, 3L)))
  }

  test("likelihood argmax prefers rare-symbol pairs over raw frequency (vs BPE)") {
    // qu ×10, q only ever before u: c12 = c1 → score 1/c2 beats the
    // frequent-but-promiscuous (t,##h) pair BPE would pick first.
    val w = Array(("qu", 10L), ("th", 60L), ("ta", 60L))
    val first = WordPiece.trainFromWords(w, 1).head
    assert(first.pair == "q ##u" && first.c12 == 10L && first.c1 == 10L)
  }

  test("rewrite is leftmost non-overlapping; pair counts include overlapping positions") {
    // xaaa = [x,##a,##a,##a]: pair (##a,##a) counted at BOTH positions
    // (c12 = 2), scoring 2/(3·3) — ahead of (x,##b) = 50/(51·50) and
    // (x,##a) = 1/(51·3). After the merge the rewrite takes the leftmost
    // pair only: xaaa → [x, ##aa, ##a] (NOT [x, ##a, ##aa]).
    val w = Array(("xaaa", 1L), ("xb", 50L))
    val ms = WordPiece.trainFromWords(w, 1)
    assert(ms.head.pair == "##a ##a" && ms.head.c12 == 2L &&
      ms.head.c1 == 3L && ms.head.c2 == 3L && ms.head.merged == "##aa")
    val vocab = new java.util.HashSet[String]()
    WordPiece.vocabOf(w, ms).foreach(vocab.add)
    // leftmost-non-overlap pinned through the segmenter: greedy ##aa then ##a
    assert(WordPiece.segment("xaaa", vocab, 2).toSeq == Seq("x", "##aa", "##a"))
  }

  test("segment: greedy longest-match-first, position-dependent ## matching") {
    val ms = WordPiece.trainFromWords(words, nMerges = 64)
    val vocab = new java.util.HashSet[String]()
    WordPiece.vocabOf(words, ms).foreach(vocab.add)
    def seg(w: String) = WordPiece.segment(w, vocab, 3).toSeq
    assert(seg("aab") == Seq("aab"))
    assert(seg("ab") == Seq("ab"))
    assert(seg("aba") == Seq("ab", "##a"))     // longest initial piece wins
    assert(seg("aabab") == Seq("aab", "##ab"))
    assert(seg("") == Seq.empty)
    assert(seg("ba") == Seq(WordPiece.Unk))    // no word-initial 'b'
    assert(seg("abz") == Seq(WordPiece.Unk))   // mid-word dead end → whole-word UNK
  }

  test("expression: struct shape, n_unk, and bit-identity with the driver segmenter") {
    val ms = WordPiece.trainFromWords(words, nMerges = 64)
    val vocab = WordPiece.vocabOf(words, ms)
    val docs = Seq((1L, "aab ab aba"), (2L, "ba aab"), (3L, ""), (4L, "  ab  "))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        WordPieceExprs.wordpiece_segment(col("text"), vocab.toSeq).as("u"))
      .select(col("doc_id"), col("u.n_pieces"), col("u.n_unk"), col("u.seg"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val asMap = got
    assert(asMap(1L) == ((4L, 0L, "aab ab ab|##a")))
    assert(asMap(2L) == ((2L, 1L, "[UNK] aab")))
    assert(asMap(3L) == ((0L, 0L, "")))
    assert(asMap(4L) == ((1L, 0L, "ab")))
  }

  test("learn on a DataFrame matches trainFromWords on its word weights") {
    val docs = Seq((1L, "aab ab ab"), (2L, "ab aab")).toDF("doc_id", "text")
    val fromDf = WordPiece.learn(docs, "text", nMerges = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    val direct = WordPiece.trainFromWords(Array(("aab", 2L), ("ab", 3L)), 64)
      .map(m => (m.rank, m.pair, m.merged, m.c12, m.c1, m.c2))
    assert(fromDf == direct)
  }

  test("wordpiece_segment n_pieces comes from the segmentation, not the '|' delimiter (r10 advisor)") {
    // vocab contains '|' pieces: "a|a" segments to [a, ##|, ##a] = 3 pieces,
    // but its joined seg "a|##||##a" holds three '|' characters — a
    // delimiter-derived count would report 4.
    val vocab = Seq("a", "|", "##|", "##a")
    val docs = Seq((1L, "a|a"), (2L, "|"), (3L, "ba")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        WordPieceExprs.wordpiece_segment(col("text"), vocab).as("u"))
      .select(col("doc_id"), col("u.n_pieces"), col("u.n_unk"), col("u.seg"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((3L, 0L, "a|##||##a")))
    assert(got(2L) === ((1L, 0L, "|")))
    assert(got(3L) === ((1L, 1L, WordPiece.Unk)))
  }
}
