package graft

import org.apache.spark.sql.functions._

/** q133–q137: structural properties the DuckDB hash-match cannot express —
  * cross-query consistency (decontamination vs the corpus split, dedup
  * verdicts vs the pair set) and frame semantics (trailing window really
  * trailing).
  */
class ContractBatch4Spec extends SparkSpec {

  test("q133: benchmark docs are excluded, hits never exceed grams, and a benchmark twin is flagged") {
    val out = SparkEntry.queries("q133_decontaminate")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 10 != 0), "benchmark docs must not appear")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)), "n_hits <= n_grams")
    val statuses = out.map(_.getString(3)).toSet
    assert(statuses.subsetOf(Set("contaminated", "clean")))
    // every status matches its own counts — the flag is a pure function
    assert(out.forall(r =>
      (r.getLong(2) * 2 >= r.getLong(1)) == (r.getString(3) == "contaminated")))
  }

  test("q134: trailing 7-day frame matches a per-row recomputation") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._2)
    val expected = ev.map { case (id, u, t, _) =>
      id -> byUser(u).count(e => e._3 <= t && e._3 > t - 7L * 86400L * 1000000L).toLong
    }.toMap
    val got = SparkEntry.queries("q134_rolling_window")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("q135: one row per unordered source pair; Jaccard consistent with its own integers") {
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    val out = SparkEntry.queries("q135_source_overlap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.length.toLong === nSources * (nSources - 1) / 2)
    assert(out.forall { case (a, b, _, _, _) => a < b })
    assert(out.forall { case (_, _, i, u, j) => i <= u && j == i.toDouble / u })
    // vocabulary Jaccard is symmetric-by-construction and bounded
    assert(out.forall { case (_, _, _, _, j) => j >= 0.0 && j <= 1.0 })
  }

  test("q136: 20 bins cover every row; bin ids stay in [0, 19] with min and max occupied") {
    val rows = SparkEntry.queries("q136_histogram")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf((0L to 19L).toSet))
    assert(rows.contains(0L) && rows.contains(19L), "extremes must land in the edge bins")
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.values.sum === total)
  }

  test("q137: verdicts partition the space — one keeper per cluster, every vector judged once") {
    val out = SparkEntry.queries("q137_semantic_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(out.length.toLong === nVecs, "every vector gets a verdict")
    val byCluster = out.groupBy(_._2)
    for ((root, members) <- byCluster) {
      assert(members.count(_._3 == "keep") === 1, s"cluster $root must keep exactly one")
      assert(members.find(_._3 == "keep").get._1 === root, "keeper is the min id (the root)")
      assert(members.forall(_._1 >= root), "root is the cluster minimum")
    }
  }
}
