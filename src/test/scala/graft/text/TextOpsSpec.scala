package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount ignores leading/trailing/multiple whitespace") {
    val df = Seq("  a b   c ", "one", "").toDF("t")
    val got = df.select(TextOps.tokenCount($"t")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(3L, 1L, 0L))
  }

  test("charLen and punctCount") {
    val row = Seq("ab, cd!").toDF("t")
      .select(TextOps.charLen($"t"), TextOps.punctCount($"t")).head()
    assert((row.getLong(0), row.getLong(1)) === ((7L, 2L)))
  }

  test("bpeish token count: letter runs one piece, digits and punctuation one each") {
    val got = Seq("hello world42x, foo-bar").toDF("t")
      .select(TextOps.bpeishTokenCount($"t")).head().getLong(0)
    // hello | world | 4 | 2 | x | , | foo | - | bar
    assert(got === 9L)
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est un animal et la maison est pour les amis",
      "el perro es un animal y las casas son para los amigos",
      "花 猫 在 垫子 上",
      "xyzzy qwerty asdf").toDF("t")
    val got = df.select(TextOps.langId($"t")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("qualityBucket flags short docs and punctuation soup") {
    val df = Seq(
      "a b",                                        // too_short
      "!!! ??? ;;; ,,, ... !!! ??? ;;;",            // punct soup (also short tokens)
      "this is a perfectly reasonable sentence with enough words to pass the filters"
    ).toDF("t")
    val got = df.select(TextOps.qualityBucket($"t")).collect().map(_.getString(0))
    assert(got(0) === "too_short")
    assert(got(2) === "ok")
  }

  test("fingerprintRolling is order-sensitive; fingerprintMd5 matches known digest") {
    val fps = Seq("a b c", "c b a").toDF("t")
      .select(TextOps.fingerprintRolling($"t")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
    val h = Seq("abc").toDF("t").select(TextOps.fingerprintMd5($"t")).head().getString(0)
    assert(h === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("fingerprintRollingChars: Horner closed form, char-order-sensitive, agrees with xxhash64 fold on dup structure") {
    // closed form pinned by hand: "ab" -> (0·B + 97)·B + 98 mod M
    val b = 1000003L; val m = 2147483647L
    val ab = Seq("ab").toDF("t")
      .select(TextOps.fingerprintRollingChars($"t")).head().getLong(0)
    assert(ab === (97L * b + 98L) % m)
    // order-sensitive at CHARACTER granularity: token-level folds can't
    // see an intra-token transposition of identical token multisets
    val fps = Seq("ab c", "ba c", "ab c").toDF("t")
      .select(TextOps.fingerprintRollingChars($"t")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1) && fps(0) === fps(2))
    assert(Seq("").toDF("t")
      .select(TextOps.fingerprintRollingChars($"t")).head().getLong(0) === 0L)
    // differential vs the xxhash64 fast path: identical duplicate-group
    // structure over a corpus with planted exact dups
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val both = docs.select($"doc_id",
      TextOps.fingerprintRolling($"text").as("fast"),
      TextOps.fingerprintRollingChars($"text").as("det")).collect()
    def groups(key: Array[(Long, Long)]): Set[Set[Long]] =
      key.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups(both.map(r => (r.getLong(0), r.getLong(1)))) ===
      groups(both.map(r => (r.getLong(0), r.getLong(2)))))
  }

  test("cleanText: zero-width strip + NFC composition; strip order unblocks composition") {
    def clean(s: String): String =
      Seq(s).toDF("t").select(TextOps.cleanText($"t")).head().getString(0)
    assert(clean("abc") === "abc") // ASCII identity (fast path)
    assert(clean("e\u0301") === "\u00e9") // decomposed -> composed e-acute
    // a zero-width char BETWEEN base and mark: strip must run first, or
    // NFC cannot compose across it
    assert(clean("e\u200b\u0301") === "\u00e9")
    assert(clean("A\u200b\u200c\u200d\ufeffB") === "AB")
    // double accent: only the first composes (e-acute + combining acute remains)
    assert(clean("\u00e9\u0301") === "\u00e9\u0301")
    // already-NFC text with real non-ASCII passes through unchanged
    assert(clean("caf\u00e9 na\u00efve") === "caf\u00e9 na\u00efve")
  }

  test("gopherFlags: each rule trips on its planted violation and only that rule") {
    val good = ("the cat sat on a mat and then walked to the door of the house " +
      "with a friend that must have been waiting there for quite some time now ") * 3
    val docs = Seq(
      (1L, good),                                            // passes everything
      (2L, "too few words here"),                            // word count < 50
      (3L, ("supercalifragilisticexpialidocious " * 60) + good), // mean word len > 10
      (4L, ("# # # # # # # # # # # # # # # # # # # # # # # # # # # # " * 2) + good), // symbols
      (5L, (1 to 60).map(i => s"- bullet item $i").mkString("\n")), // all lines bulleted
      (6L, (1 to 60).map(i => s"trailing line $i...").mkString("\n")), // all lines ellipsis-ended
      (7L, ("12345 67890 11111 22222 33333 44444 " * 12) + "the a"), // <80% alpha words
      (8L, good.replace("the", "xx").replace(" a ", " yy ").replace("and", "zz")
        .replace("that", "qq").replace("with", "ww")) // every stop-list word scrubbed
    ).toDF("doc_id", "text")
    val f = TextOps.gopherFlags(docs, "text", stopWords = Seq("the", "a", "and", "that", "with"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(1L).getAs[Boolean]("gopher_pass"), "the clean doc must pass all seven rules")
    assert(!f(2L).getAs[Boolean]("ok_word_count") && f(1L).getAs[Boolean]("ok_word_count"))
    assert(!f(3L).getAs[Boolean]("ok_mean_word_len"))
    assert(!f(4L).getAs[Boolean]("ok_symbol_ratio"))
    assert(!f(5L).getAs[Boolean]("ok_bullet_lines"))
    assert(!f(6L).getAs[Boolean]("ok_ellipsis_lines"))
    assert(!f(7L).getAs[Boolean]("ok_alpha_words"))
    assert(!f(8L).getAs[Boolean]("ok_stopwords"))
    for (id <- 2L to 8L)
      assert(!f(id).getAs[Boolean]("gopher_pass"), s"doc $id must fail the composite")
    // the violations are independent: doc 5's words pass the count rule
    assert(f(5L).getAs[Boolean]("ok_word_count"))
  }

  test("gopherRepetitionFlags: each repetition rule trips on its planted violation") {
    val clean = (1 to 40).map(i => s"w${i}word$i").mkString(" ") // all-distinct words, one line
    val dupLines = "xx yy zz\nxx yy zz\naa bb cc\ndd ee ff\ngg hh ii"  // 2/5 lines dup > 0.30
    val dupParas = "pp qq rr\n\npp qq rr\n\nss tt uu"                  // 2/3 paras dup > 0.30
    val topHeavy = ("ab cd " * 10) + (1 to 20).map(i => s"t$i").mkString(" ") // "ab cd" dominates
    // one repeated FIVE-word run in otherwise-distinct text: 5-gram dup
    // coverage trips, but every 6-gram spanning it has distinct context
    val run5 = (1 to 10).map(i => s"a$i").mkString(" ") + " vv ww xx yy zz " +
      (1 to 10).map(i => s"b$i").mkString(" ") + " vv ww xx yy zz " +
      (1 to 5).map(i => s"c$i").mkString(" ")
    val run10 = (1 to 8).map(i => s"d$i").mkString(" ") +
      " q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 " + (1 to 8).map(i => s"e$i").mkString(" ") +
      " q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 " + (1 to 4).map(i => s"f$i").mkString(" ")
    val docs = Seq((1L, clean), (2L, dupLines), (3L, dupParas), (4L, topHeavy),
      (5L, run5), (6L, run10)).toDF("doc_id", "text")
    val f = TextOps.gopherRepetitionFlags(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(1L).getAs[Boolean]("repetition_pass"), "the clean doc must pass all 13 rules")
    assert(!f(2L).getAs[Boolean]("ok_dup_lines") && !f(2L).getAs[Boolean]("ok_dup_line_chars"))
    assert(!f(3L).getAs[Boolean]("ok_dup_paras") && !f(3L).getAs[Boolean]("ok_dup_para_chars"))
    assert(!f(4L).getAs[Boolean]("ok_top2_chars"))
    assert(!f(5L).getAs[Boolean]("ok_dup5_chars"),
      "a twice-occurring 5-word run must trip the 5-gram coverage rule")
    assert(f(5L).getAs[Boolean]("ok_dup6_chars"),
      "no 6-gram repeats (distinct context around the run) — the rules are independent")
    for (n <- 5 to 10)
      assert(!f(6L).getAs[Boolean](s"ok_dup${n}_chars"),
        s"a repeated 10-word run covers repeated $n-grams too")
    for (id <- 2L to 6L)
      assert(!f(id).getAs[Boolean]("repetition_pass"), s"doc $id must fail the composite")
    // line/para rules don't fire on single-line docs
    assert(f(4L).getAs[Boolean]("ok_dup_lines") && f(4L).getAs[Boolean]("ok_dup_paras"))
  }

  test("gopherFlags ok_symbol_ratio: hash and ellipsis ratios are judged SEPARATELY (Rae et al. A1.1)") {
    // 116 words, 8 hashes, 8 ellipses: each ratio is 8/116 ≈ 0.069 ≤ 0.1 so
    // the paper's rule passes — the r9 combined bound ((8+8)·10 > 116)
    // wrongly failed this doc. 13 of either alone (13/113 ≈ 0.115) fails.
    val w100 = ("the cat sat on a mat and then walked to " * 10).trim
    val docs = Seq(
      (1L, w100 + (" #" * 8) + (" word..." * 8)),   // 0.069 + 0.069 → pass
      (2L, w100 + (" #" * 13)),                     // hash ratio 13/113 > 0.1 → fail
      (3L, w100 + (" word..." * 13))                // ellipsis ratio 13/113 → fail
    ).toDF("doc_id", "text")
    val f = TextOps.gopherFlags(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("ok_symbol_ratio")).toMap
    assert(f(1L), "0.08 hash + 0.08 ellipsis must pass: the two tests are independent")
    assert(!f(2L), "hash ratio alone over 0.1 must fail")
    assert(!f(3L), "ellipsis ratio alone over 0.1 must fail")
  }
}
