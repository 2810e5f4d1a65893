package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Modified Kneser–Ney: clamped count-of-count discounts by hand, the
  * exact normalization identity with the CLAMPED values, hand-computed
  * Q16 scores (incl. a fully-discounted count-3 pair and both backoff
  * shapes), and the degenerate-stats guards.
  */
class MknSpec extends SparkSpec {
  import spark.implicits._

  // Same corpus as KnSpec: pairs (a,b)=3 (b,a)=1 (b,<unk>)=2 →
  // n1=n2=n3=1, n4=0, A=3, Dden=3; d1n=1 (D1=1/3), d2n=3 (D2=1),
  // d3n=max(9,1)=9 (D3=3 — the count-3 pair is FULLY discounted).
  private lazy val trainDocs =
    Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
  private lazy val lm = LangModel.trainModifiedKn(trainDocs, "doc_id", "text", minCount = 2L)

  test("discount numerators: hand values, including the D3 edge and both clamps") {
    assert((lm.d1n, lm.d2n, lm.d3n, lm.dden) == ((1L, 3L, 9L, 3L)))
    // clamp floors fire when the C&G estimate leaves (0, c]:
    // n=(1,1,2,6): d3 raw = (3*3*2 - 4*1*6)*1 = -6 → floored to 1
    assert(LangModel.mknDiscounts(1L, 1L, 2L, 6L) == ((2L, 1L, 1L, 6L)))
    intercept[IllegalArgumentException] { LangModel.mknDiscounts(0L, 1L, 1L, 0L) }
    intercept[IllegalArgumentException] { LangModel.mknDiscounts(5L, 0L, 1L, 0L) }
  }

  test("contexts carry the N1/N2/N3+ splits; totals as KN") {
    val ctx = lm.contexts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(ctx == Map("a" -> ((3L, 0L, 0L, 1L)), "b" -> ((3L, 1L, 1L, 0L))))
    val tot = lm.totals.collect().head
    assert((tot.getLong(0), tot.getLong(1)) == ((3L, 3L)))
  }

  /** Σ_w2 P(w2|w1) = 1 with the CLAMPED discounts: per seen context, the
    * integer numerators over den = c1·Dden·(R+V) sum exactly to den —
    * the identity clamping must preserve (same D in discount and γ). */
  test("exact normalization with clamped discounts") {
    val pairs = lm.pairs.collect().map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getLong(2))).toMap
    val ctx = lm.contexts.collect().map(r => r.getString(0) ->
      ((BigInt(r.getLong(1)), BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4))))).toMap
    val cont = lm.continuations.collect().map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
    val tot = lm.totals.collect().head
    val rv = BigInt(tot.getLong(0)) + BigInt(tot.getLong(1))
    def dn(c: BigInt): BigInt =
      if (c == 0) 0 else if (c == 1) lm.d1n else if (c == 2) lm.d2n else lm.d3n
    val slots = Seq("a", "b", LangModel.Unk)
    for ((w1, (c1, m1, m2, m3)) <- ctx) {
      val den = c1 * lm.dden * rv
      val gamma = m1 * lm.d1n + m2 * lm.d2n + m3 * lm.d3n
      val numSum = slots.map { w2 =>
        val c12 = pairs.getOrElse((w1, w2), BigInt(0))
        (c12 * lm.dden - dn(c12)) * rv + gamma * (cont.getOrElse(w2, BigInt(0)) + 1)
      }.sum
      assert(numSum == den, s"context $w1: $numSum != $den")
    }
  }

  test("scoreMknQ16: hand-computed terms incl. fully-discounted pair and backoffs") {
    // "a b c a" → (a,b): (3·3−9)·6 + 9·2 = 18 over 54 (D3 wipes the count);
    //             (b,<unk>): (2·3−3)·6 + 4·2 = 26 over 54;
    //             (<unk>,a): unseen context → 2 over 6
    val f = Unigram.fixedLog2Q16 _
    val expected = (f(54L) - f(18L)) + (f(54L) - f(26L)) + (f(6L) - f(2L))
    val row = LangModel.scoreMknQ16(
      Seq((10L, "a b c a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    assert(row.getLong(1) == 3L)
    assert(row.getLong(2) == expected)
    assert(row.getLong(3) == expected / 3L)
  }

  test("every term non-negative; unseen continuations of seen contexts stay positive") {
    // (a,<unk>) has c12=0 under context a whose only followers are count-3:
    // γ(a) = d3n·1 = 9 > 0 keeps the numerator positive (the clamp's point)
    val out = LangModel.scoreMknQ16(
      Seq((40L, "a z a"), (41L, "z z z"), (42L, "a b x c")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
    assert(out.filter(col("nlg2_q16") < 0 || col("mean_nlg2_q16") < 0).count() == 0)
  }

  test("sub-bigram docs are absent; MKN ranks reference-like below noise") {
    val out = LangModel.scoreMknQ16(
      Seq((20L, "a"), (21L, ""), (30L, "a b a b a b"), (31L, "z q w e r t"))
        .toDF("doc_id", "text"), "doc_id", "text", lm)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(!got.contains(20L) && !got.contains(21L))
    assert(got(30L) < got(31L))
  }

  test("mknDiscounts rejects count-of-counts whose products overflow Long (r10 advisor)") {
    // 9e6 * 3e6 * 3e6 = 8.1e19 > 2^63: the old Long arithmetic wrapped
    // NEGATIVE and sailed through the caller's < MaxValue envelope check.
    val e = intercept[IllegalArgumentException] {
      LangModel.mknDiscounts(3000000L, 3000000L, 3000000L, 1L)
    }
    assert(e.getMessage.contains("overflow Long"))
    // d2n-only overflow: Dden = (n1+2n2)·n2·n3 ≈ 8.0e18 still fits, but
    // D2n = (2an2−3n1n3)·n3 ≈ 1.6e19 does not
    val e2 = intercept[IllegalArgumentException] {
      LangModel.mknDiscounts(1L, 2000000000L, 1L, 1L)
    }
    assert(e2.getMessage.contains("overflow Long"))
    // near the boundary but inside: still exact
    assert(LangModel.mknDiscounts(1L, 1L, 2L, 6L) == ((2L, 1L, 1L, 6L)))
  }
}
