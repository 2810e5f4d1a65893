package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-doubling suffix ranks: hand-computed ranks on a crafted corpus
  * (lexicographic order, shorter-suffix-first, cross-doc duplicate
  * windows), equivalence with a brute-force window sort at several
  * depths, and the doc-boundary discipline.
  */
class SuffixRanksSpec extends SparkSpec {
  import spark.implicits._

  // d1 = "b a b a", d2 = "a b a c": depth-2 windows
  //   d1: (b,a) (a,b) (b,a) (a)     d2: (a,b) (b,a) (a,c) (c)
  // sorted distinct: (a) < (a,b) < (a,c) < (b,a) < (c)  → ranks 1..5
  private lazy val docs =
    Seq((1L, "b a b a"), (2L, "a b a c")).toDF("doc_id", "text")

  test("depth 2: hand-computed ranks, dup flags, shorter-suffix-first order") {
    val got = SuffixRanks.suffixRanks(docs, "doc_id", "text", depth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      (1L, 1L) -> ((4L, true)), (1L, 2L) -> ((2L, true)),
      (1L, 3L) -> ((4L, true)), (1L, 4L) -> ((1L, false)),
      (2L, 1L) -> ((2L, true)), (2L, 2L) -> ((4L, true)),
      (2L, 3L) -> ((3L, false)), (2L, 4L) -> ((5L, false))))
  }

  test("windows never cross document boundaries") {
    // "x y" + "y x": if windows crossed docs, (y, x) would duplicate
    val d = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val got = SuffixRanks.suffixRanks(d, "doc_id", "text", depth = 2)
    assert(got.filter(col("is_dup")).count() == 0)
  }

  /** Brute-force reference: dense rank of the materialized ≤ depth-token
    * windows under (lexicographic, shorter-first) — the oracle's
    * definition, recomputed driver-side. */
  private def bruteRanks(rows: Seq[(Long, String)], depth: Int) = {
    val pos = for {
      (did, text) <- rows
      ws = text.split("\\s+").filter(_.nonEmpty)
      i <- ws.indices
    } yield (did, i + 1L, ws.slice(i, i + depth).toSeq)
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits.seqOrdering
    val rank = pos.map(_._3).distinct.sorted.zipWithIndex
      .map { case (w, i) => w -> (i + 1L) }.toMap
    val cnt = pos.groupBy(_._3).map { case (w, g) => w -> g.size }
    pos.map { case (d, i, w) => (d, i) -> ((rank(w), cnt(w) > 1)) }.toMap
  }

  test("doubling equals the brute-force window sort at depths 1, 2, 4, 8") {
    val rows = Seq(
      (1L, "a b a b a b c"), (2L, "b a b a"), (3L, "c"), (4L, ""),
      (5L, "a b a b a b c"), (6L, "ab a b"))
    val d = rows.toDF("doc_id", "text")
    for (depth <- Seq(1, 2, 4, 8)) {
      val got = SuffixRanks.suffixRanks(d, "doc_id", "text", depth)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap
      assert(got == bruteRanks(rows, depth), s"depth=$depth")
    }
  }

  test("dupWindowStats equals the per-doc aggregate of suffixRanks' is_dup") {
    val d = Seq((1L, "a b a b a b c"), (2L, "b a b a"), (3L, "c"),
      (5L, "a b a b a b c")).toDF("doc_id", "text")
    val viaRanks = SuffixRanks.suffixRanks(d, "doc_id", "text", 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"), count(when(col("is_dup"), 1)).as("n_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = SuffixRanks.dupWindowStats(d, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == viaRanks && direct.nonEmpty)
  }

  test("depth must be a power of two") {
    intercept[IllegalArgumentException] {
      SuffixRanks.suffixRanks(docs, "doc_id", "text", depth = 6)
    }
  }

  test("stripDuplicatedSpans: first occurrence kept, overlap union, per-doc rebuild (hand fixture)") {
    // depth 2: duplicated full windows across the fixture docs.
    //   d1 = "x y z w"      windows (x,y) (y,z) (z,w)
    //   d2 = "x y z q"      windows (x,y) (y,z) (z,q)
    //   d3 = "q x y z w"    windows (q,x) (x,y) (y,z) (z,w)
    //   d4 = "u v"          windows (u,v)           — unique, untouched
    //   d5 = ""                                      — empty doc
    // dup keys: (x,y) first at (1,1); (y,z) first at (1,2); (z,w) first
    // at (1,3). Removals: d2 wi=1,2 → covers pos 1..3; d3 wi=2,3,4 →
    // covers pos 2..5.
    val docs = Seq((1L, "x y z w"), (2L, "x y z q"), (3L, "q x y z w"),
      (4L, "u v"), (5L, "")).toDF("doc_id", "text")
    val got = SuffixRanks.stripDuplicatedSpans(docs, "doc_id", "text", depth = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((4L, 4L, "x y z w")), "every dup window's FIRST occurrence is kept whole")
    assert(got(2L) === ((4L, 1L, "q")), "positions 1-3 covered by two removal spans (union)")
    assert(got(3L) === ((5L, 1L, "q")), "overlapping removals strip 2-5, position 1 survives")
    assert(got(4L) === ((2L, 2L, "u v")), "unique windows never strip")
    assert(got(5L) === ((0L, 0L, "")), "empty docs survive with empty clean text")
  }

  test("stripDuplicatedSpans: tail windows shorter than depth never strip") {
    // "a b" and "c a b": the full depth-4 windows don't exist (docs are
    // shorter), so even though "a b" repeats, nothing is stripped.
    val docs = Seq((1L, "a b"), (2L, "c a b")).toDF("doc_id", "text")
    val got = SuffixRanks.stripDuplicatedSpans(docs, "doc_id", "text", depth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 2L, "a b")))
    assert(got(2L) === ((3L, 3L, "c a b")))
  }

  test("stripContaminatedSpans: every match removed, bench fragments never contaminate") {
    // bench: "x y z w" (full depth-2 windows); "u" (too short — inert).
    // train: an exact copy (stripped to NOTHING — no first-kept survivor),
    // a partial overlap, a doc repeating the inert bench fragment, empty.
    val bench = Seq((2L, "x y z w"), (4L, "u")).toDF("doc_id", "text")
    val train = Seq((1L, "x y z w"), (3L, "a x y b"), (5L, "u u"), (7L, ""))
      .toDF("doc_id", "text")
    val got = SuffixRanks.stripContaminatedSpans(train, bench, "doc_id", "text", depth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set(1L, 3L, 5L, 7L), "train docs only, original ids")
    assert(got(1L) === ((4L, 0L, "")), "an exact benchmark copy is stripped wholesale")
    assert(got(3L) === ((4L, 2L, "a b")), "only the contaminated window's positions go")
    assert(got(5L) === ((2L, 2L, "u u")), "a bench doc shorter than depth contaminates nothing")
    assert(got(7L) === ((0L, 0L, "")), "empty train docs survive with empty clean text")
  }

  test("stripContaminatedSpans: ids outside [0, 2^62) are rejected loudly (r11 advisor)") {
    // the 2k/2k+1 tag encoding wraps/collides silently past 2^62 (and a
    // negative id breaks the % 2 side split) — must be a loud require
    val ok = Seq((1L, "a b c")).toDF("doc_id", "text")
    val big = Seq((1L << 62, "a b c")).toDF("doc_id", "text")
    val neg = Seq((-1L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      SuffixRanks.stripContaminatedSpans(big, ok, "doc_id", "text", depth = 2)
    }
    assert(e1.getMessage.contains("2^62"))
    val e2 = intercept[IllegalArgumentException] {
      SuffixRanks.stripContaminatedSpans(ok, neg, "doc_id", "text", depth = 2)
    }
    assert(e2.getMessage.contains("2^62"))
  }

  test("stripContaminatedSpans: train-internal duplication is NOT removed") {
    // both train docs repeat each other but share nothing with bench —
    // decontamination must not dedup the training corpus
    val bench = Seq((2L, "p q r s")).toDF("doc_id", "text")
    val train = Seq((1L, "x y z w"), (3L, "x y z w")).toDF("doc_id", "text")
    val got = SuffixRanks.stripContaminatedSpans(train, bench, "doc_id", "text", depth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((4L, 4L, "x y z w")))
    assert(got(3L) === ((4L, 4L, "x y z w")))
  }
}
