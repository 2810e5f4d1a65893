package graft.dedup

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val w = 4
  private def run(docs: Seq[(String, String)]) =
    SpanDedup.dedupSpans(docs.toDF("id", "text"), "id", "text", w)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

  test("cross-document span: only the shared run is covered and stripped") {
    val out = run(Seq(
      "a" -> "alpha beta gamma delta epsilon unique1 unique2",
      "b" -> "prefix1 prefix2 alpha beta gamma delta epsilon suffix1",
      "d" -> "Totally DIFFERENT words here"))
    // shared 5-token run → two duplicated 4-windows per doc, 5 covered tokens
    assert(out("a") === ((7L, 2L, 5L, "unique1 unique2")))
    assert(out("b") === ((8L, 2L, 5L, "prefix1 prefix2 suffix1")))
    // a clean doc passes through (lowercased — the normalizing tokenizer)
    assert(out("d") === ((4L, 0L, 0L, "totally different words here")))
  }

  test("within-document repetition is a duplicate too; full coverage strips all") {
    val out = run(Seq("c" -> "x y z w x y z w"))
    // windows at pos 1 and 5 share the fingerprint "x y z w"
    assert(out("c") === ((8L, 2L, 8L, "")))
  }

  test("docs shorter than the window yield no grams and pass through") {
    val out = run(Seq("e" -> "tiny doc", "f" -> "tiny doc"))
    // even though e and f are identical, no length-4 window exists
    assert(out("e") === ((2L, 0L, 0L, "tiny doc")))
    assert(out("f") === ((2L, 0L, 0L, "tiny doc")))
  }

  test("coverage merges overlapping duplicated windows without double-counting") {
    // g and h share a 6-token run → three 4-windows, union of coverage = 6
    val out = run(Seq(
      "g" -> "one two three four five six tailg",
      "h" -> "headh one two three four five six"))
    assert(out("g") === ((7L, 3L, 6L, "tailg")))
    assert(out("h") === ((7L, 3L, 6L, "headh")))
  }
}
