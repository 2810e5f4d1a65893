package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.time.LocalDate

class RelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupAll is idempotent and drops exact duplicates") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 3)).toDF("k", "v")
    val d1 = RelOps.dedupAll(df)
    assert(d1.count() === 3)
    assert(RelOps.dedupAll(d1).count() === 3)
  }

  test("collapseByMax keeps one row per key and takes per-column maxima (mixing rows)") {
    // the MMD quirk: (k=1) group takes v=5 from row 1 and w="z" from row 2
    val df = Seq((1, 5, "a"), (1, 2, "z"), (2, 1, "b")).toDF("k", "v", "w")
    val out = RelOps.collapseByMax(df, Seq("k")).orderBy("k").collect()
    assert(out.toSeq === Seq(Row(1, 5, "z"), Row(2, 1, "b")))
  }

  test("collapseByMax output keys are unique; max >= every group value") {
    val df = Seq((1, 3), (1, 9), (1, 7), (2, 4)).toDF("k", "v")
    val out = RelOps.collapseByMax(df, Seq("k"))
    assert(out.select("k").distinct().count() === out.count())
    assert(out.filter($"k" === 1).head().getInt(1) === 9)
  }

  test("latestRowPerGroup picks the row with max order col, tiebreak applied") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (1, 20, "newer"), (2, 5, "only"))
      .toDF("k", "ts", "tag")
    val out = RelOps.latestRowPerGroup(df, Seq("k"), $"ts", Seq($"tag".desc))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("newer", "only"))
  }

  test("latestPerGroupAgg equals window form on the greatest value") {
    val df = Seq((1, 10), (1, 30), (2, 7)).toDF("k", "ts")
    val agg = RelOps.latestPerGroupAgg(df, Seq("k"), $"ts", "m").orderBy("k").collect()
    assert(agg.map(_.getInt(1)).toSeq === Seq(30, 7))
  }

  test("enrichJoin inner drops facts without a dim match; row count bounded by fact") {
    val fact = Seq((1, "x"), (2, "y"), (3, "z")).toDF("site", "v")
    val dim = Seq((1, "A"), (2, "B")).toDF("site_code", "name")
    val out = RelOps.enrichJoin(fact, dim, fact("site") === dim("site_code"))
    assert(out.count() === 2)
  }

  test("caseNormalize maps listed values, default constant, and passthrough") {
    val df = Seq("a", "b", "zzz", null).toDF("c")
    val const = df.select(RelOps.caseNormalize($"c", Seq("a" -> "A", "b" -> "B"), Some("other")).as("o"))
      .collect().map(_.getString(0))
    assert(const.toSeq === Seq("A", "B", "other", "other"))
    val pass = df.select(RelOps.caseNormalize($"c", Seq("a" -> "A"), None).as("o"))
      .collect().map(_.getString(0))
    assert(pass.toSeq === Seq("A", "b", "zzz", null))
    val orNull = df.select(RelOps.caseNormalizeOrNull($"c", Seq("a" -> "A")).as("o"))
      .collect().map(_.getString(0))
    assert(orNull.toSeq === Seq("A", null, null, null))
  }

  test("conditionalCounts returns a single row of per-value counts") {
    val df = Seq("R", "R", "A", "N", "R").toDF("f")
    val row = RelOps.conditionalCounts(df, $"f", Seq("R" -> "r", "A" -> "a", "X" -> "x")).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((3L, 1L, 0L)))
  }

  test("stringifyAll turns 'None' strings into real nulls and all types to string") {
    val df = Seq((1, "None"), (2, "ok")).toDF("i", "s")
    val out = RelOps.stringifyAll(df).collect()
    assert(out(0).getString(0) === "1" && out(0).isNullAt(1))
    assert(out(1).getString(1) === "ok")
  }

  test("boundaryDiff month/year follow BigQuery boundary-crossing semantics") {
    val df = Seq(("2023-01-01", "2022-12-31")).toDF("d1", "d2")
      .select(to_date($"d1").as("d1"), to_date($"d2").as("d2"))
    val row = df.select(
      RelOps.boundaryDiffYears($"d1", $"d2"),
      RelOps.boundaryDiffMonths($"d1", $"d2"),
      RelOps.boundaryDiffDays($"d1", $"d2")).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((1L, 1L, 1L)))
  }

  test("boundaryDiffMonths property: matches java.time boundary count over a date sweep") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(40)((rnd.nextInt(20000).toLong, rnd.nextInt(20000).toLong))
    val rows = samples.map { case (a, b) =>
      (LocalDate.ofEpochDay(a).toString, LocalDate.ofEpochDay(b).toString)
    }
    val got = rows.toDF("d1", "d2")
      .select(RelOps.boundaryDiffMonths(to_date($"d1"), to_date($"d2")).as("m"))
      .collect().map(_.getLong(0))
    val expected = samples.map { case (a, b) =>
      val (d1, d2) = (LocalDate.ofEpochDay(a), LocalDate.ofEpochDay(b))
      (d1.getYear - d2.getYear) * 12L + (d1.getMonthValue - d2.getMonthValue)
    }
    assert(got.toSeq === expected)
  }

  test("asOfJoin picks the latest right row at-or-before each left time, per key") {
    val trades = Seq((1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3"), (3, 5, "t4"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 20, 200.0))
      .toDF("k", "t", "px")
    val out = RelOps.asOfJoin(trades, quotes, "k", "t", "t", Seq("px"))
      .orderBy("trade").collect()
    // t1@10: quote@10 visible (>= semantics); t2@20: quote@18; t3@15: none
    // before 15 for k=2; t4: k=3 has no quotes at all
    assert(out.map(r => (r.getString(2), Option(r.get(3)))).toSeq === Seq(
      ("t1", Some(101.0)), ("t2", Some(102.0)), ("t3", None), ("t4", None)))
  }

  test("rangeJoinBinned equals the naive BETWEEN join, including boundary values") {
    val fact = Seq(0, 1, 10, 11, 16, 30, 31, 50, 51).map(v => (v.toLong, s"r$v")).toDF("v", "tag")
    val ranges = Seq((1L, 10L, "A"), (11L, 30L, "B"), (31L, 50L, "C"), (5L, 35L, "WIDE"))
      .toDF("lo", "hi", "band")
    val binned = RelOps.rangeJoinBinned(fact, "v", ranges, "lo", "hi", binWidth = 7)
      .select("tag", "band").as[(String, String)].collect().toSet
    val naive = fact.join(ranges, $"v" >= $"lo" && $"v" <= $"hi")
      .select("tag", "band").as[(String, String)].collect().toSet
    assert(binned === naive)
    assert(binned.contains(("r1", "A")) && binned.contains(("r50", "C")))
    assert(!binned.exists(_._1 == "r0") && !binned.exists(_._1 == "r51"))
  }

  test("filterNotNull keeps only rows with all listed columns present") {
    val df = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("x", "y")
    assert(RelOps.filterNotNull(df, Seq("x", "y")).count() === 1)
  }

  test("topK returns exactly k rows in total order") {
    val df = (1 to 100).map(i => (i, i * 2)).toDF("k", "v")
    val out = RelOps.topK(df, 5, $"v".desc, $"k".asc).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(100, 99, 98, 97, 96))
  }

  test("unionDistinct = bag union then distinct") {
    val a = Seq(1, 2, 3).toDF("v")
    val b = Seq(3, 4).toDF("v")
    assert(RelOps.unionDistinct(Seq(a, b)).count() === 4)
  }

  test("momentStats matches hand-computed variance/corr exactly and builtin stddev closely") {
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)).toDF("x", "y")
    val row = RelOps.momentStats(df, Seq.empty, $"x", $"y").head()
    // var of 1..4 = 5/3 (sample); y = 2x -> corr 1 up to the sqrt rounding
    // (the operator's guarantee is cross-engine BIT-reproducibility of the
    // formula, not algebraic exactness of the float result)
    assert(math.abs(row.getAs[Double]("var_x") - 5.0 / 3.0) < 1e-15)
    assert(math.abs(row.getAs[Double]("corr_xy") - 1.0) < 1e-12)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_quantity".cast("long").as("x"), $"l_linenumber".cast("long").as("y"))
    val got = RelOps.momentStats(li, Seq.empty, $"x", $"y").head()
    val builtin = li.agg(stddev($"x"), corr($"x", $"y")).head()
    assert(math.abs(got.getAs[Double]("stddev_x") - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(got.getAs[Double]("corr_xy") - builtin.getDouble(1)) < 1e-9)
  }

  test("profileColumns: approx single-scan mode matches exact mode on all non-distinct stats") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_returnflag")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4), r.getString(5))).toMap
    val ex = RelOps.profileColumns(li, cols, exact = true)
    val ap = RelOps.profileColumns(li, cols, exact = false)
    assert(keyed(ex) === keyed(ap))
    // approx distinct within the configured rsd of exact
    val exD = ex.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    ap.collect().foreach { r =>
      val (c, nd) = (r.getString(0), r.getLong(3))
      assert(math.abs(nd - exD(c)).toDouble / math.max(exD(c), 1L) < 0.1, s"$c: $nd vs ${exD(c)}")
    }
  }

  test("asOfJoin equals the naive per-row latest-lookup on a randomized set (seeded)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "lt")
    // unique (k, rt) pairs: on an exact tie the window's pick among equal
    // times is unspecified, so the generator avoids ties rather than the
    // oracle guessing them
    val pairs = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    while (pairs.size < 300) pairs += ((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = pairs.toSeq.zipWithIndex.map { case ((k, rt), i) => (k, rt, i.toLong * 10) }
      .toDF("k", "rt", "rv")
    val got = RelOps.asOfJoin(
        left, right.withColumnRenamed("rt", "t_r"), key = "k",
        leftTime = "lt", rightTime = "t_r", rightVals = Seq("rv"))
      .select($"lid", $"asof_rv").as[(Long, Option[Long])].collect().toMap
    // naive oracle: for each left row, the unique max-rt right row with rt <= lt
    val rightRows = right.as[(Long, Long, Long)].collect()
    val exp = left.as[(Long, Long, Long)].collect().map { case (lid, k, lt) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= lt)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got === exp)
  }

  test("asOfJoinForward equals the naive per-row earliest-lookup (seeded), ties visible") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "lt")
    val pairs = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    while (pairs.size < 300) pairs += ((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = pairs.toSeq.zipWithIndex.map { case ((k, rt), i) => (k, rt, i.toLong * 10) }
      .toDF("k", "rt", "rv")
    val got = RelOps.asOfJoinForward(
        left, right.withColumnRenamed("rt", "t_r"), key = "k",
        leftTime = "lt", rightTime = "t_r", rightVals = Seq("rv"))
      .select($"lid", $"asofnext_rv").as[(Long, Option[Long])].collect().toMap
    val rightRows = right.as[(Long, Long, Long)].collect()
    val exp = left.as[(Long, Long, Long)].collect().map { case (lid, k, lt) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 >= lt)
      lid -> (if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
    }.toMap
    assert(got === exp)
  }

  test("fillDown carries the last non-null value forward per key") {
    val df = Seq(
      (1L, 1L, Some(10L)), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some(40L)),
      (2L, 1L, None), (2L, 2L, Some(5L))).toDF("k", "t", "v")
    val out = RelOps.fillDown(df, Seq("k"), Seq($"t".asc), $"v", "filled")
      .select($"k", $"t", $"filled").as[(Long, Long, Option[Long])].collect().toSet
    assert(out === Set(
      (1L, 1L, Some(10L)), (1L, 2L, Some(10L)), (1L, 3L, Some(10L)), (1L, 4L, Some(40L)),
      (2L, 1L, None), (2L, 2L, Some(5L))))
  }

  test("semiJoin filters by existence without multiplying rows; antiJoin is its complement") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // k=1 matches TWICE: a plain join would duplicate the row, semi must not
    val right = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("rk", "w")
    val semi = RelOps.semiJoin(left, right, left("k") === right("rk"))
    assert(semi.columns.toSeq === Seq("k", "v"))
    assert(semi.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val anti = RelOps.antiJoin(left, right, left("k") === right("rk"))
    assert(anti.select("k").as[Long].collect().toSeq === Seq(2L))
  }
}
