package graft

import graft.ops.RelOps
import graft.sketch.CountMin
import org.apache.spark.sql.functions._

/** Count-min sketch guarantees and MAD outlier flags on planted data. */
class CountMinMadSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates are one-sided and exact when collision-free") {
    // few keys vs a wide sketch: no collisions → est == exact
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val cells = CountMin.sketch(df, "k", depth = 4, width = 1024)
    val est = CountMin.estimates(df.distinct(), "k", cells, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("count-min overcounts are never negative under heavy collisions") {
    val df = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val cells = CountMin.sketch(df, "k", depth = 4, width = 16)
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
    val joined = CountMin.estimates(df.distinct(), "k", cells, depth = 4, width = 16)
      .join(exact, "k").select(col("est") - col("n")).collect().map(_.getLong(0))
    assert(joined.forall(_ >= 0L), "count-min must never undercount")
    assert(joined.exists(_ > 0L), "width 16 with 500 keys must collide somewhere")
  }

  test("count-min absent key estimates 0 and stays in the output (r7 advisor)") {
    // a key never sketched hashes (with width 1024 and 3 sketched keys,
    // near-certainly) to at least one unoccupied cell: the left join +
    // coalesce must yield est = 0, never a dropped row or a min over
    // fewer than depth cells
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val cells = CountMin.sketch(df, "k", depth = 4, width = 1024)
    val probes = Seq("a", "absent_key_1", "absent_key_2").toDF("k")
    val est = CountMin.estimates(probes, "k", cells, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 5L, "absent_key_1" -> 0L, "absent_key_2" -> 0L))
  }

  test("count-min cell grid is bounded by depth x width") {
    val df = (1 to 1000).map(i => s"k$i").toDF("k")
    assert(CountMin.sketch(df, "k", depth = 4, width = 16).count() <= 4L * 16)
  }

  test("joinSizeEstimate never underestimates and is exact when collision-free") {
    val a = (Seq.fill(4)("k1") ++ Seq.fill(2)("k2") ++ Seq("k3")).toDF("k")
    val b = (Seq.fill(3)("k1") ++ Seq.fill(5)("k2") ++ Seq("k9")).toDF("k")
    // true join size = 4*3 + 2*5 = 22; width 1024 → no collisions → exact
    val wide = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "k", 4, 1024), CountMin.sketch(b, "k", 4, 1024))
      .collect().head.getLong(0)
    assert(wide === 22L)
    // width 2 → heavy collisions → still an upper bound
    val tight = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "k", 4, 2), CountMin.sketch(b, "k", 4, 2))
      .collect().head.getLong(0)
    assert(tight >= 22L)
  }

  test("withMadFlag: the median shrugs at the wild value a z-score masks") {
    // group g: nine values near 100 and one at 100000 — MAD flags exactly
    // the wild row; med/mad are untouched by it
    val df = ((1 to 9).map(i => ("g", 95L + i)) :+ (("g", 100000L))).toDF("grp", "x")
    val out = RelOps.withMadFlag(df, "grp", col("x"), c = 3L)
    val flagged = out.filter(col("is_out")).select("x").collect().map(_.getLong(0)).toSeq
    assert(flagged === Seq(100000L))
    val r = out.select("med", "mad").distinct().collect().head
    assert(r.getLong(0) === 100L) // lower median of 96..104, 100000
    assert(r.getLong(1) === 2L)   // deviations 0..4 and 99900 -> lower median 2
  }

  test("withMadFlag: constant group flags nothing (mad = 0, x = med)") {
    val df = Seq(("g", 7L), ("g", 7L), ("g", 7L)).toDF("grp", "x")
    assert(RelOps.withMadFlag(df, "grp", col("x")).filter(col("is_out")).count() === 0L)
  }

  test("olsTrendPair: exact slope on a planted line; zero on a flat series") {
    val df = ((1L to 10L).map(x => ("up", x, 2 * x + 5)) ++
      (1L to 10L).map(x => ("flat", x, 42L))).toDF("grp", "x", "y")
    val out = RelOps.olsTrendPair(df, "grp", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (nU, numU, denU) = out("up")
    assert(nU === 10L && denU > 0L && numU === 2L * denU) // slope exactly 2
    assert(out("flat")._2 === 0L) // zero covariance
  }

  test("cusumMax locates a planted mean shift at its exact index") {
    // ten zeros then ten hundreds: max |n*S_i - i*S_n| lands at i = 10
    val df = ((1 to 10).map(i => ("u", i.toLong, 0L)) ++
      (11 to 20).map(i => ("u", i.toLong, 100L))).toDF("grp", "t", "x")
    val r = RelOps.cusumMax(df, "grp", col("t"), col("t"), col("x")).collect().head
    assert(r.getLong(1) === 20L)
    assert(r.getLong(2) === 10000L) // |20*0 - 10*1000|
    assert(r.getLong(3) === 10L)    // the change point
  }

  test("cusumMax: a flat series has zero statistic at the earliest index") {
    val df = (1 to 5).map(i => ("u", i.toLong, 7L)).toDF("grp", "t", "x")
    val r = RelOps.cusumMax(df, "grp", col("t"), col("t"), col("x")).collect().head
    assert(r.getLong(2) === 0L && r.getLong(3) === 1L)
  }
}
