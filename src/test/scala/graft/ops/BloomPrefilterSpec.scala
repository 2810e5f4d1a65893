package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomPrefilterSpec extends SparkSpec {

  test("bloom semi join is exactly the plain semi join (false positives removed)") {
    val li = Tables.lineitem(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val bloomed = BloomPrefilter.semiJoin(li, "l_orderkey", urgent, "o_orderkey",
      expectedKeys = 1 << 14, fpp = 0.05)
    val exact = li.join(urgent.select("o_orderkey").distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(bloomed.count() === exact.count())
    assert(bloomed.select("l_orderkey", "l_linenumber")
      .except(exact.select("l_orderkey", "l_linenumber")).isEmpty)
  }

  test("mightContain never rejects a present key (no false negatives)") {
    val build = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val bloom = BloomPrefilter.buildKeyBloom(build, "o_orderkey", 1 << 14, 0.01)
    val missed = build.filter(!BloomPrefilter.mightContain(bloom, col("o_orderkey"))).count()
    assert(missed === 0L)
  }

  test("a tight bloom actually filters: most absent keys are rejected map-side") {
    val build = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").limit(100)
    val bloom = BloomPrefilter.buildKeyBloom(build, "o_orderkey", 1 << 10, 0.01)
    // probe with keys far outside the build domain
    val absent = spark.range(1000000, 1010000).toDF("k")
    val passed = absent.filter(BloomPrefilter.mightContain(bloom, col("k"))).count()
    assert(passed < 500, s"fpp blowout: $passed of 10000 absent keys passed")
  }
}
