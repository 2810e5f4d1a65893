package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: rewrite fires exactly when it should,
  * plans lose their nested loop, and results are bit-identical to the
  * naive theta-join across bound strictness, signs, orientation, and
  * extra conjuncts. All on an isolated newSession so the conf-gated rule
  * never leaks into the shared session's plans.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private def freshSession(binWidth: Long): SparkSession = {
    val s = spark.newSession()
    RangeJoinRule.install(s, binWidth)
    s
  }

  private def sides(s: SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    // intervals straddle negatives; lengths 0..40
    val iv = (-50L to 50L).map(i => (i, i * 7 % 97, i * 7 % 97 + (i % 41 + 40) % 41))
      .toDF("ik", "lo", "hi")
    val pt = (-200L to 200L).map(p => (p, p * 3 % 101)).toDF("pk", "p")
    (iv, pt)
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("band theta-join rewrites to an equi-join; rows match the naive plan exactly") {
    val s = freshSession(16L)
    val (iv, pt) = sides(s)
    val joined = pt.join(iv, col("lo") <= col("p") && col("p") <= col("hi"))
    val plan = physical(joined)
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate explode"), plan)

    val s0 = spark.newSession() // no rule: the naive nested loop is the oracle
    val (iv0, pt0) = sides(s0)
    val naive = pt0.join(iv0, col("lo") <= col("p") && col("p") <= col("hi"))
    assert(physical(naive).contains("NestedLoopJoin"))
    val got = joined.collect().map(_.toSeq).toSet
    val want = naive.collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("strict bounds and reversed writing order keep exact semantics") {
    val s = freshSession(8L)
    val (iv, pt) = sides(s)
    // hi > p AND p > lo, written backwards, interval side on the left
    val joined = iv.join(pt, col("hi") > col("p") && col("p") > col("lo"))
    assert(!physical(joined).contains("NestedLoopJoin"))
    val s0 = spark.newSession()
    val (iv0, pt0) = sides(s0)
    val naive = iv0.join(pt0, col("hi") > col("p") && col("p") > col("lo"))
    assert(joined.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet)
  }

  test("single-sided conjuncts ride along; the band still rewrites") {
    val s = freshSession(16L)
    val (iv, pt) = sides(s)
    val joined = pt.join(iv,
      col("lo") <= col("p") && col("p") <= col("hi") && col("ik") % 2 === 0 && col("pk") > -100L)
    assert(!physical(joined).contains("NestedLoopJoin"))
    val s0 = spark.newSession()
    val (iv0, pt0) = sides(s0)
    val naive = pt0.join(iv0,
      col("lo") <= col("p") && col("p") <= col("hi") && col("ik") % 2 === 0 && col("pk") > -100L)
    assert(joined.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet)
  }

  test("guard: an existing cross-side equality conjunct leaves the join untouched") {
    val s = freshSession(16L)
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 5L, 15L), (2L, 0L, 9L)).toDF("k2", "s", "e")
    val joined = a.join(b, col("k") === col("k2") && col("s") <= col("v") && col("v") <= col("e"))
    val plan = physical(joined)
    assert(!plan.contains("Generate explode"), plan) // no rewrite
    assert(joined.count() == 1)
  }

  test("guard: a third cross-side predicate (not a pure band) is not rewritten") {
    val s = freshSession(16L)
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 25L)).toDF("k", "v")
    val b = Seq((9L, 5L, 15L), (24L, 20L, 30L)).toDF("w", "s", "e")
    val joined = a.join(b,
      col("s") <= col("v") && col("v") <= col("e") && col("w") < col("v"))
    assert(!physical(joined).contains("Generate explode"))
    assert(joined.count() == 2)
  }

  test("guard: conf unset means no-op even with the rule injected") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(RangeJoinRule)
    val (iv, pt) = sides(s)
    val joined = pt.join(iv, col("lo") <= col("p") && col("p") <= col("hi"))
    assert(physical(joined).contains("NestedLoopJoin"))
  }

  test("width 1 and width far above interval length both stay correct") {
    for (w <- Seq(1L, 10000L)) {
      val s = freshSession(w)
      val (iv, pt) = sides(s)
      val joined = pt.join(iv, col("lo") <= col("p") && col("p") <= col("hi"))
      assert(!physical(joined).contains("NestedLoopJoin"))
      val s0 = spark.newSession()
      val (iv0, pt0) = sides(s0)
      val naive = pt0.join(iv0, col("lo") <= col("p") && col("p") <= col("hi"))
      assert(joined.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet,
        s"width $w")
    }
  }
}
