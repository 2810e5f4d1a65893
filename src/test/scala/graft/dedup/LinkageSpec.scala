package graft.dedup

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def customers = spark.read.parquet(s"$sfDir/customer.parquet")
    .select(col("c_custkey").as("id"), col("c_nationkey").cast("long").as("nation"),
      col("c_name").as("name"))

  test("salted blockedPairs equals the naive within-block theta join exactly") {
    val c = customers
    // the reference: the single-partition-per-block shape we refuse to run
    val a = c.as("a"); val b = c.as("b")
    val naive = a.join(b, col("a.nation") === col("b.nation") && col("a.id") < col("b.id"))
      .select(col("a.id").as("x"), col("b.id").as("y"))
      .as[(Long, Long)].collect().toSet
    val salted = Linkage.blockedPairs(c, "nation", "id", saltFanout = 8)
      .select(col("a.id").as("x"), col("b.id").as("y"))
      .as[(Long, Long)].collect().toSet
    assert(salted === naive, "salt decomposition must be lossless and duplication-free")
    assert(salted.size === naive.size)
  }

  test("blockedPairs salting yields an equi-join plan, not a nested loop") {
    val plan = Linkage.blockedPairs(customers, "nation", "id", saltFanout = 8)
      .queryExecution.explainString(SimpleMode)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("saltFanout=1 degenerates to the plain blocked join (same pairs)") {
    val c = customers.filter(col("nation") < 3)
    val one = Linkage.blockedPairs(c, "nation", "id", saltFanout = 1)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val eight = Linkage.blockedPairs(c, "nation", "id", saltFanout = 8)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(one === eight)
  }

  test("neighborhoodPairs is O(n·w) and every matched pair is in the exhaustive twin") {
    val c = customers
    val n = c.count()
    val w = 3
    val nb = Linkage.neighborhoodPairs(c, "nation", Seq("name", "id"), window = w)
    assert(nb.count() <= n * w, "candidate band must stay O(n·w)")
    // differential contract (q174 vs q140): every neighborhood pair whose
    // names are within edit distance 1 appears in the exhaustive blocked
    // pairs (lev <= 3 superset) with the SAME unordered identity
    val lev1 = graft.functions.StringExprs.bounded_levenshtein(
      col("a.name"), col("b.name"), 1)
    val nbMatched = nb.filter(lev1 >= 0)
      .select(least(col("a.id"), col("b.id")).as("x"),
        greatest(col("a.id"), col("b.id")).as("y"))
      .as[(Long, Long)].collect().toSet
    val lev3 = graft.functions.StringExprs.bounded_levenshtein(
      col("a.name"), col("b.name"), 3)
    val exhaustive = Linkage.blockedPairs(c, "nation", "id")
      .filter(lev3 >= 0)
      .select(col("a.id").as("x"), col("b.id").as("y"))
      .as[(Long, Long)].collect().toSet
    assert(nbMatched.subsetOf(exhaustive),
      s"${(nbMatched -- exhaustive).size} neighborhood matches missing from the exhaustive twin")
    assert(nbMatched.nonEmpty, "test corpus must produce at least one near-match")
  }

  test("pair orientation: blockedPairs emits a.id < b.id, each pair once") {
    val c = customers.filter(col("nation") === 0)
    val pairs = Linkage.blockedPairs(c, "nation", "id")
      .select(col("a.id").as("x"), col("b.id").as("y")).as[(Long, Long)].collect()
    assert(pairs.forall { case (x, y) => x < y })
    assert(pairs.length === pairs.toSet.size, "no duplicated pairs")
    val m = c.count()
    assert(pairs.length === (m * (m - 1) / 2), "exactly the n-choose-2 pairs")
  }
}
