package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.io.Versioned

/** PHASE PROFILER for the versioned-format bench tail (r7 verdict #4):
  * q201/q203/q205 are end-to-end stories (create table → mutate → read), so
  * their bench seconds conflate FIXTURE cost (committing the base table —
  * paid once per table in production, per run in the bench) with the
  * PER-OPERATION cost that actually matters at 100 TB (deleteWhere /
  * updateWhere / MOR read / manifest resolution). This main times each phase
  * separately at SPARK_GRAFT_SF_DIR so DESIGN.md can state — with numbers —
  * which slice is O(table-once) fixture, which is O(matched delta), and
  * which is O(manifest) metadata.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileVersioned"
  */
object ProfileVersioned {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }

    // warmup: absorb codegen/classload outside the phase timings
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().count()

    println(s"[profile] == q201_delete_vectors phases (sf=$sfDir) ==")
    locally {
      val vt = new Versioned(spark, java.nio.file.Files.createTempDirectory("prof_dv").toString)
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
      phase("fixture: commit base table")(vt.commit("t", li))
      phase("op: deleteWhere #1 (flag = R)")(vt.deleteWhere("t", col("l_returnflag") === "R"))
      phase("op: deleteWhere #2 (qty >= 45, anti-join dv)")(vt.deleteWhere("t", col("l_quantity") >= 45))
      phase("read: v1 time travel + agg")(vt.readVersion("t", 1L).groupBy("l_linestatus").count().count())
      phase("read: MOR (2 dvs) + agg")(vt.read("t").groupBy("l_linestatus").count().count())
      phase("op: purgeDeletes (rewrite dirty files)")(vt.purgeDeletes("t"))
      phase("read: purged + agg")(vt.read("t").groupBy("l_linestatus").count().count())
    }

    println(s"[profile] == q203_mor_update phases ==")
    locally {
      val vt = new Versioned(spark, java.nio.file.Files.createTempDirectory("prof_up").toString)
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
      phase("fixture: commit base table")(vt.commit("t", li))
      phase("op: updateWhere (qty >= 45)")(vt.updateWhere("t", col("l_quantity") >= 45,
        Map("l_quantity" -> (col("l_quantity") - 40))))
      phase("op: deleteWhere (flag = R)")(vt.deleteWhere("t", col("l_returnflag") === "R"))
      phase("read: MOR + agg")(vt.read("t").groupBy("l_linestatus")
        .agg(count(lit(1)), sum(col("l_quantity").cast("long"))).count())
    }

    println(s"[profile] == q205_mv_incremental phases ==")
    locally {
      import graft.plans.MvRewriteRule
      val vt = new Versioned(spark, java.nio.file.Files.createTempDirectory("prof_mv").toString)
      val mvDir = java.nio.file.Files.createTempDirectory("prof_mv_v1").toString
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
      val base = Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("k"), col("o_orderpriority").as("grp"), cents.as("v"))
      phase("fixture: commit base (bloom+stats)")(vt.commit("t", base, statsCol = Some("k")))
      phase("fixture: build MV rollup")(MvRewriteRule.create(spark, "prof_rollup",
        vt.readVersion("t", 1L), mvDir, groupCols = Seq("grp"), aggCols = Seq("v")))
      phase("op: commitAppend (10% late rows)")(vt.commitAppend("t",
        base.filter(col("k") % 10 === 7)
          .select((col("k") + 10000000L).as("k"), col("grp"), (col("v") + 5L).as("v")),
        statsCol = Some("k")))
      phase("op: mergeByKey (10% of keys, pruned CoW)")(vt.mergeByKey("t",
        vt.read("t").filter(col("k") % 10 === 3).withColumn("v", col("v") + 1000L), "k"))
      phase("read: full table + rollup agg")(vt.read("t").groupBy("grp")
        .agg(count(lit(1)), sum(col("v"))).count())
    }

    println(s"[profile] == manifest metadata path (O(manifest), not O(table)) ==")
    locally {
      val vt = new Versioned(spark, java.nio.file.Files.createTempDirectory("prof_meta").toString)
      val tiny = spark.range(100).select(col("id").as("k"), (col("id") % 7).as("v"))
      vt.commit("t", tiny)
      phase("50 O(delta) appends")((1 to 50).foreach(i =>
        vt.commitAppend("t", spark.range(i * 1000, i * 1000 + 10)
          .select(col("id").as("k"), (col("id") % 7).as("v")))))
      phase("resolve v51 (chain <= checkpoint interval)")(vt.snapshotFiles("t", 51L))
      phase("read latest after 50 appends")(vt.read("t").count())
    }

    println(s"[profile] == MOR read path: scan-fused DV predicate vs anti-join (8 reads) ==")
    locally {
      val root = java.nio.file.Files.createTempDirectory("prof_dvread").toString
      val fast = new Versioned(spark, root)
      val anti = new Versioned(spark, root, dvPredicateMax = 0L)
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"), col("l_linestatus"))
      fast.commit("t", li)
      fast.deleteWhere("t", col("l_returnflag") === "R" && col("l_quantity") < 10)
      fast.deleteWhere("t", col("l_linestatus") === "F" && col("l_quantity") > 45)
      phase("8x MOR read, predicate path (1st resolves+caches)")((1 to 8).foreach(_ =>
        fast.read("t").groupBy("l_returnflag").agg(sum("l_quantity")).count()))
      phase("8x MOR read, anti-join path")((1 to 8).foreach(_ =>
        anti.read("t").groupBy("l_returnflag").agg(sum("l_quantity")).count()))
    }
    spark.stop()
  }
}
