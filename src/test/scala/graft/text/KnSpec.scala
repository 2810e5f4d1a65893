package graft.text

import graft.SparkSpec
import graft.functions.LogExprs
import org.apache.spark.sql.functions._

/** Kneser–Ney bigram LM: trained-frame counts checked by hand, the exact
  * rational normalization identity Σ_w2 P(w2|w1) = 1 proved in BigInt on
  * the trained frames, hand-computed Q16 scores, backoff edge cases, and
  * the codegen'd flog2_q16 kernel bit-checked against its driver-side
  * definition.
  */
class KnSpec extends SparkSpec {
  import spark.implicits._

  // Same corpus as LangModelSpec: vocab(minCount=2) = {a, b};
  // mapped streams d1 = a b a b <unk>, d2 = a b <unk>.
  // pairs: (a,b)=3 (b,a)=1 (b,<unk>)=2
  // contexts: a→(c1=3,t1=1) b→(c1=3,t1=2)
  // continuations: a→1 b→1 <unk>→1;  R = 3 types, V = 3 slots.
  private lazy val trainDocs =
    Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
  private lazy val lm = LangModel.trainKneserNey(trainDocs, "doc_id", "text", minCount = 2L)

  test("trainKneserNey: pairs, contexts, continuations, totals by hand") {
    val pairs = lm.pairs.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "<unk>") -> 2L))
    val ctx = lm.contexts.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ctx == Map("a" -> ((3L, 1L)), "b" -> ((3L, 2L))))
    val cont = lm.continuations.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cont == Map("a" -> 1L, "b" -> 1L, "<unk>" -> 1L))
    val tot = lm.totals.collect().head
    assert((tot.getLong(0), tot.getLong(1)) == ((3L, 3L)))
  }

  /** The rational identity that makes KN a PROPER distribution: for every
    * seen context w1, the integer numerators over the common denominator
    * 4·c1·(R+V) sum exactly to the denominator across all V slots. */
  test("exact normalization: sum of num over vocab+unk slots equals den per context") {
    val pairs = lm.pairs.collect().map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getLong(2))).toMap
    val ctx = lm.contexts.collect().map(r => r.getString(0) -> ((BigInt(r.getLong(1)), BigInt(r.getLong(2))))).toMap
    val cont = lm.continuations.collect().map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
    val tot = lm.totals.collect().head
    val rv = BigInt(tot.getLong(0)) + BigInt(tot.getLong(1))
    val slots = Seq("a", "b", LangModel.Unk)
    for ((w1, (c1, t1)) <- ctx) {
      val den = 4 * c1 * rv
      val numSum = slots.map { w2 =>
        val c12 = pairs.getOrElse((w1, w2), BigInt(0))
        val r2 = cont.getOrElse(w2, BigInt(0))
        (4 * c12 - 3).max(BigInt(0)) * rv + 3 * t1 * (r2 + 1)
      }.sum
      assert(numSum == den, s"context $w1: $numSum != $den")
    }
  }

  test("scoreKnQ16: hand-computed Q16 terms incl. OOV and unseen-context backoff") {
    // "a b c a" maps to (a,b), (b,<unk>), (<unk>,a):
    //   (a,b):     num = max(12-3,0)*6 + 3*1*(1+1) = 60, den = 4*3*6 = 72
    //   (b,<unk>): num = max(8-3,0)*6  + 3*2*(1+1) = 42, den = 72
    //   (<unk>,a): c1 = 0 → backoff: num = r2+1 = 2, den = R+V = 6
    val f = Unigram.fixedLog2Q16 _
    val expected = (f(72L) - f(60L)) + (f(72L) - f(42L)) + (f(6L) - f(2L))
    val row = LangModel.scoreKnQ16(
      Seq((10L, "a b c a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    assert(row.getLong(1) == 3L)
    assert(row.getLong(2) == expected)
    assert(row.getLong(3) == expected / 3L)
  }

  test("every per-bigram term is non-negative (num <= den), so floor-div modes agree") {
    val terms = LangModel.scoreKnQ16(
      Seq((40L, "a b a b"), (41L, "z z z z"), (42L, "c a b x")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
    assert(terms.filter(col("nlg2_q16") < 0 || col("mean_nlg2_q16") < 0).count() == 0)
  }

  test("sub-bigram docs are unscorable and absent") {
    val out = LangModel.scoreKnQ16(
      Seq((20L, "a"), (21L, ""), (22L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(22L))
  }

  test("KN ranks reference-like docs below all-OOV noise (lower = better)") {
    val scored = LangModel.scoreKnQ16(
      Seq((30L, "a b a b a b"), (31L, "z q w e r t")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(30L) < scored(31L))
  }

  test("flog2_q16 codegen kernel is bit-identical to the driver definition") {
    val xs = Seq(1L, 2L, 3L, 5L, 42L, 65535L, 65536L, 65537L,
      (1L << 31) - 1, 1L << 40, Long.MaxValue) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) | 1L)
    val got = xs.toDF("x")
      .select(LogExprs.flog2_q16(col("x")).as("lg")).as[Long].collect()
    assert(got.toSeq == xs.map(Unigram.fixedLog2Q16))
  }
}
