package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernel behind [[RepetitionExprs.GopherRepetitionStats]]: the
  * REPETITION half of the Gopher quality battery (Rae et al. 2021, arXiv
  * 2112.11446 §A1.1, second half) needs per-document duplicate-group and
  * n-gram-coverage statistics — inherently procedural (hash maps over
  * lines/grams, a position-coverage union), so it lives here as one pass
  * per document rather than as interpreted higher-order-function lambdas
  * (the ~10 µs/element tax) or a per-line/per-gram explode+groupBy shuffle
  * (lines and grams never need to leave their document).
  *
  * All outputs are exact integer counts; "characters" are Unicode code
  * points (Spark `length` and DuckDB `len` semantics, which is what lets
  * the oracle recompute every field relationally):
  *  - lines   = `\n`-separated, kept when trim-nonempty (gopherFlags' rule)
  *  - paras   = `\n\n`-separated, kept when trim-nonempty
  *  - dup*    = occurrences in content groups of size ≥ 2 (a line that
  *              appears twice contributes BOTH occurrences — the public
  *              convention of the open Gopher reimplementations)
  *  - top-n   = chars covered by the most frequent word n-gram:
  *              count × Σ word chars; ties broken by (count DESC,
  *              gram chars DESC, gram UTF-8 bytes ASC — [[graft.text.Bpe.byteLess]],
  *              the binary collation DuckDB and Spark both give ORDER BY
  *              on strings) — deterministic and restatable as a SQL window
  *  - dup-n   = chars of words covered by ≥1 POSITION of any n-gram that
  *              occurs ≥ 2 times in the doc — positional UNION, overlaps
  *              counted once (the paper's "fraction of characters
  *              contained within duplicate n-grams")
  */
object RepetitionAlgs {

  val fieldNames: Array[String] = Array(
    "n_lines", "dup_lines", "line_chars", "dup_line_chars",
    "n_paras", "dup_paras", "para_chars", "dup_para_chars",
    "word_chars", "top2_chars", "top3_chars", "top4_chars",
    "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
    "dup9_chars", "dup10_chars")

  @inline private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** (occurrences, dupOccurrences, chars, dupChars) over a unit array. */
  private def dupStats(units: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < units.length) {
      counts.merge(units(i), 1L, (a, b) => a + b); i += 1
    }
    var dupOcc = 0L; var chars = 0L; var dupChars = 0L
    i = 0
    while (i < units.length) {
      val c = cpLen(units(i))
      chars += c
      if (counts.get(units(i)) >= 2L) { dupOcc += 1L; dupChars += c }
      i += 1
    }
    (units.length.toLong, dupOcc, chars, dupChars)
  }

  /** trim-nonempty with SQL `trim` semantics: Spark and DuckDB both strip
    * U+0020 ONLY (Java's String.trim strips all control chars ≤ 0x20 and
    * would disagree with the oracle on a tab-only line). */
  @inline private def hasNonSpace(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) != ' ') return true; i += 1 }
    false
  }

  def gopherRepetitionStats(text: UTF8String): InternalRow = {
    val s = text.toString
    val lines = s.split("\n", -1).filter(hasNonSpace)
    val paras = s.split("\n\n", -1).filter(hasNonSpace)
    val (nLines, dupLines, lineChars, dupLineChars) = dupStats(lines)
    val (nParas, dupParas, paraChars, dupParaChars) = dupStats(paras)

    val words = s.split("\\s+").filter(_.nonEmpty)
    val wlen = new Array[Long](words.length)
    var wordChars = 0L
    var i = 0
    while (i < words.length) { wlen(i) = cpLen(words(i)); wordChars += wlen(i); i += 1 }

    // top-n gram coverage, n = 2..4
    val top = new Array[Long](3)
    var n = 2
    while (n <= 4) {
      val counts = new java.util.HashMap[String, Long]()
      i = 0
      while (i + n <= words.length) {
        counts.merge(words.slice(i, i + n).mkString(" "), 1L, (a, b) => a + b)
        i += 1
      }
      var bestCnt = 0L; var bestChars = -1L; var bestGram: String = null
      counts.forEach { (g, c) =>
        val gc = cpLen(g) - (n - 1) // words carry no whitespace
        if (c > bestCnt || (c == bestCnt && (gc > bestChars ||
            (gc == bestChars && (bestGram == null || graft.text.Bpe.byteLess(g, bestGram)))))) {
          bestCnt = c; bestChars = gc; bestGram = g
        }
      }
      top(n - 2) = if (bestGram == null) 0L else bestCnt * bestChars
      n += 1
    }

    // duplicated-n-gram positional coverage, n = 5..10
    val dupN = new Array[Long](6)
    n = 5
    while (n <= 10) {
      val nG = words.length - n + 1
      if (nG >= 2) {
        val counts = new java.util.HashMap[String, Long]()
        val grams = new Array[String](nG)
        i = 0
        while (i < nG) {
          grams(i) = words.slice(i, i + n).mkString(" ")
          counts.merge(grams(i), 1L, (a, b) => a + b)
          i += 1
        }
        val covered = new Array[Boolean](words.length)
        i = 0
        while (i < nG) {
          if (counts.get(grams(i)) >= 2L) {
            var j = i
            while (j < i + n) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        var cov = 0L
        i = 0
        while (i < words.length) { if (covered(i)) cov += wlen(i); i += 1 }
        dupN(n - 5) = cov
      }
      n += 1
    }

    new GenericInternalRow(Array[Any](
      nLines, dupLines, lineChars, dupLineChars,
      nParas, dupParas, paraChars, dupParaChars,
      wordChars, top(0), top(1), top(2),
      dupN(0), dupN(1), dupN(2), dupN(3), dupN(4), dupN(5)))
  }
}
