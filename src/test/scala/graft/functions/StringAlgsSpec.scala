package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class StringAlgsSpec extends AnyFunSuite {

  /** Reference full-matrix Levenshtein (textbook, obviously correct). */
  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bounded(a: String, b: String, k: Int): Int =
    StringAlgs.boundedLev(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("exhaustive over short binary-alphabet strings, all bounds") {
    val alpha = Seq("", "a", "b", "ab", "ba", "aab", "abb", "bab", "abab", "bbaa")
    for (a <- alpha; b <- alpha; k <- 0 to 5) {
      val want = { val d = refLev(a, b); if (d <= k) d else -1 }
      assert(bounded(a, b, k) === want, s"a='$a' b='$b' k=$k")
    }
  }

  test("property: agrees with full DP under the bound, -1 above it (5k seeded random cases)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "xyz01"
    def str(): String =
      Seq.fill(rnd.nextInt(13))(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 5000) {
      val a = str(); val b = str(); val k = rnd.nextInt(7)
      val want = { val d = refLev(a, b); if (d <= k) d else -1 }
      assert(bounded(a, b, k) === want, s"a='$a' b='$b' k=$k")
    }
  }

  test("multibyte fallback path matches the char-level reference") {
    val cases = Seq(
      ("héllo", "hello", 1), ("héllo", "héllo", 0), ("日本語", "日本誤", 3),
      ("añb", "ab", 2), ("ß", "ss", 2))
    for ((a, b, k) <- cases) {
      val want = { val d = refLev(a, b); if (d <= k) d else -1 }
      assert(bounded(a, b, k) === want, s"a='$a' b='$b' k=$k")
    }
  }

  test("linkage-shaped keys: zero-padded ids with a long shared prefix") {
    for (k <- 0 to 4) {
      assert(bounded("Customer#000000001", "Customer#000000001", k) === 0)
      val d = refLev("000012345", "000012354")
      assert(bounded("Customer#000012345", "Customer#000012354", k) ===
        (if (d <= k) d else -1))
    }
  }

  test("gopher top-n-gram tie-break uses UTF-8 byte order, not UTF-16 code units (r10 advisor)") {
    // U+FF62 (EF BD A2) vs U+10000 (F0 90 80 80): UTF-8 bytes order the BMP
    // char FIRST, while Java's String.compareTo (UTF-16 code units, 0xFF62
    // vs surrogate 0xD800) orders it LAST -- the exact divergence the
    // shared byteLess comparator exists to remove.
    val bmp = "\uff62"
    val supp = new String(Character.toChars(0x10000))
    assert(graft.text.Bpe.byteLess(bmp, supp))
    assert(bmp.compareTo(supp) > 0, "Java UTF-16 order must disagree for this pin to bite")
    // a corpus where the 2-gram argmax ties on (count, chars) across the
    // divergent grams: the reported coverage is tie-break-invariant (the
    // gram itself is not emitted) and the kernel must stay exact on
    // non-BMP input under the byteLess convention
    val st = RepetitionAlgs.gopherRepetitionStats(
      UTF8String.fromString(s"$bmp $bmp $supp $supp"))
    val idx = RepetitionAlgs.fieldNames.indexOf("top2_chars")
    assert(st.getLong(idx) === 2L) // count 1 x 2 code points, whichever gram wins
    assert(st.getLong(RepetitionAlgs.fieldNames.indexOf("word_chars")) === 4L)
  }
}
