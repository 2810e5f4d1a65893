package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 cleaning rules on hand-crafted pages: each line rule (terminal
  * punctuation, ≥5 words, javascript) and page rule (≥3 sentences, lorem
  * ipsum, brace) exercised in isolation, the clean_md5 contract, and
  * blank-line handling.
  */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private def flags(pages: (Long, String)*) =
    TextOps.c4Flags(pages.toDF("doc_id", "page"), "page")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("line rules: terminal punctuation, five words, javascript") {
    val page =
      "this line has the five words." + "\n" +   // kept
        "no terminal punctuation on this line" + "\n" + // dropped: punct
        "only four words here!" + "\n" +          // dropped: < 5 words
        "please enable javascript to continue here." + "\n" + // dropped: js
        "does a question count as terminal?" + "\n" + // kept
        "\"a quoted line of five words\""          // kept: quote terminal
    val r = flags(1L -> page)(1L)
    assert(r.getAs[Long]("n_lines") == 6L)
    assert(r.getAs[Long]("n_kept") == 3L)
    // sentences = terminal marks in kept lines: '.', '?' (quote line has none)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(!r.getAs[Boolean]("c4_pass")) // < 3 sentences
  }

  test("page rules: lorem ipsum and brace each veto an otherwise-passing page") {
    val good = (1 to 3).map(i => s"a perfectly fine sentence number $i.").mkString("\n")
    val r0 = flags(1L -> good)(1L)
    assert(r0.getAs[Long]("n_sentences") == 3L && r0.getAs[Boolean]("c4_pass"))
    val r1 = flags(2L -> (good + "\nLorem Ipsum dolor sit amet."))(2L)
    assert(r1.getAs[Boolean]("has_lorem") && !r1.getAs[Boolean]("c4_pass"))
    val r2 = flags(3L -> (good + "\nvar x = { broken: true }"))(3L)
    assert(r2.getAs[Boolean]("has_brace") && !r2.getAs[Boolean]("c4_pass"))
  }

  test("blank lines are not counted; empty and all-dropped pages md5 the empty clean text") {
    val r = flags(
      1L -> "one good sentence stands entirely alone.\n\n   \n",
      2L -> "",
      3L -> "all dropped")(3L)
    val all = flags(
      1L -> "one good sentence stands entirely alone.\n\n   \n",
      2L -> "",
      3L -> "all dropped")
    assert(all(1L).getAs[Long]("n_lines") == 1L)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(all(2L).getAs[String]("clean_md5") == emptyMd5)
    assert(all(3L).getAs[String]("clean_md5") == emptyMd5)
    assert(r.getAs[Long]("n_kept") == 0L)
  }

  test("clean_md5 pins the exact retained lines joined by newline") {
    val l1 = "the first kept line is here."
    val l2 = "the second kept line follows there!"
    val page = l1 + "\nnope\n" + l2
    val got = flags(1L -> page)(1L).getAs[String]("clean_md5")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((l1 + "\n" + l2).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == expect)
  }
}
