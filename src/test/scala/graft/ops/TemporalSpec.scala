package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for [[Temporal]]: inclusive backward as-of matching (ties,
  * no-prior-match nulls, per-key isolation) and exact binned interval join
  * (boundary inclusion, bin-spanning intervals, negative coordinates) — each
  * checked against a hand-computed truth, plus a plan-shape assertion that
  * neither operator degrades to a nested loop.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinBackward: inclusive match, nulls before first quote, key isolation") {
    val trades = Seq(
      (1L, 10L, 100.0), // u1 t=10: quote at 10 matches (inclusive)
      (1L, 15L, 101.0), // u1 t=15: latest quote <= 15 is t=10
      (1L, 4L, 102.0),  // u1 t=4: before first quote -> nulls
      (2L, 50L, 103.0), // u2: only u2 quotes visible
      (3L, 99L, 104.0)  // u3: no quotes at all -> nulls
    ).toDF("user_id", "ts", "trade_val")
    val quotes = Seq(
      (1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 20L, 3.0),
      (2L, 49L, 9.0), (2L, 50L, 10.0), (2L, 51L, 11.0)
    ).toDF("user_id", "qts", "qval")
    val got = Temporal.asofJoinBackward(
        trades, quotes, Seq("user_id"), "ts", "qts", Seq("qts", "qval"))
      .select("user_id", "ts", "qts", "qval")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(got === Set(
      (1L, 10L, Some(10L), Some(2.0)),
      (1L, 15L, Some(10L), Some(2.0)),
      (1L, 4L, None, None),
      (2L, 50L, Some(50L), Some(10.0)),
      (3L, 99L, None, None)))
  }

  test("asofJoinBackward: payload columns always come from the same right row") {
    // two payload columns; if they were matched independently a mixed row
    // could appear — the struct transport forbids it
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L, "a", 90.0), (1L, 95L, "b", 95.0))
      .toDF("k", "rt", "tag", "v")
    val row = Temporal.asofJoinBackward(l, r, Seq("k"), "t", "rt", Seq("tag", "v"))
      .select("tag", "v").as[(String, Double)].head()
    assert(row === ("b", 95.0))
  }

  test("binnedIntervalJoin matches the theta-join exactly, negatives included") {
    val iv = Seq(
      (1L, -25L, -10L), // negative coords exercise floor-div binning
      (2L, 0L, 0L),     // degenerate single-point interval
      (3L, 5L, 95L),    // spans many bins
      (4L, 200L, 210L)  // matches nothing
    ).toDF("ik", "s", "e")
    val pts = (-30L to 100L by 5L).toDF("p")
    val got = Temporal.binnedIntervalJoin(pts, "p", iv, "s", "e", binWidth = 10L)
      .select("ik", "p").as[(Long, Long)].collect().toSet
    val want = (for {
      (ik, s, e) <- Seq((1L, -25L, -10L), (2L, 0L, 0L), (3L, 5L, 95L), (4L, 200L, 210L))
      p <- -30L to 100L by 5L if s <= p && p <= e
    } yield (ik, p)).toSet
    assert(got === want)
    assert(want.nonEmpty && want.contains((1L, -25L)) && want.contains((1L, -10L)))
  }

  test("neither operator plans a cartesian/nested-loop join") {
    val trades = Seq((1L, 10L, 1.0)).toDF("user_id", "ts", "v")
    val quotes = Seq((1L, 5L, 2.0)).toDF("user_id", "qts", "qval")
    val asof = Temporal.asofJoinBackward(
      trades, quotes, Seq("user_id"), "ts", "qts", Seq("qval"))
    val iv = Seq((1L, 0L, 10L)).toDF("ik", "s", "e")
    val pts = Seq(5L).toDF("p")
    val rj = Temporal.binnedIntervalJoin(pts, "p", iv, "s", "e", 10L)
    for (df <- Seq(asof, rj)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }
}
