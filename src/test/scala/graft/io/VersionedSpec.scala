package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-versioned").toString

  test("commit/read round-trip; overwrite advances the version") {
    val vt = new Versioned(spark, tmpRoot())
    assert(!vt.exists("t"))
    val v1 = vt.commit("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(v1 === 1L && vt.read("t").count() === 2)
    val v2 = vt.commit("t", Seq((9L, "z")).toDF("k", "v"))
    assert(v2 === 2L && vt.read("t").count() === 1)
    assert(vt.versions("t") === Seq(1L, 2L))
  }

  test("snapshot isolation: a reader pinned before a commit never sees it") {
    val vt = new Versioned(spark, tmpRoot())
    vt.commit("t", Seq((1L, "a")).toDF("k", "v"))
    val pinned = vt.read("t") // pins v1's manifest NOW
    vt.commit("t", Seq((2L, "b"), (3L, "c")).toDF("k", "v"))
    vt.commitAppend("t", Seq((4L, "d")).toDF("k", "v"))
    assert(pinned.count() === 1, "pinned snapshot must be immutable")
    assert(pinned.select("k").as[Long].collect().toSet === Set(1L))
    assert(vt.read("t").count() === 3, "latest = overwrite v2 + append v3")
  }

  test("time travel reads every historical version exactly") {
    val vt = new Versioned(spark, tmpRoot())
    vt.commit("t", Seq((1L, "a")).toDF("k", "v"))
    vt.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    vt.commitAppend("t", Seq((3L, "c")).toDF("k", "v"))
    assert(vt.readVersion("t", 1L).count() === 1)
    assert(vt.readVersion("t", 2L).count() === 2)
    assert(vt.readVersion("t", 3L).count() === 3)
    // append referenced history instead of rewriting it: v3 reuses v1+v2 files
    val f1 = vt.snapshotFiles("t", 1L).toSet
    val f3 = vt.snapshotFiles("t", 3L).toSet
    assert(f1.subsetOf(f3), "append must reference, not rewrite, prior files")
  }

  test("optimistic concurrency: publish is exclusive per version; appends compose across writers") {
    val vt = new Versioned(spark, tmpRoot())
    vt.commit("t", Seq((1L, "a")).toDF("k", "v"))
    // the exclusivity primitive itself: second claim of the same version
    // MUST lose (this is what turns a race into a retry, never a clobber)
    val files = vt.snapshotFiles("t", 1L).map(p => p.split("/data/").last)
    assert(vt.publish("t", 2L, files), "first claim of v2 wins")
    assert(!vt.publish("t", 2L, Seq.empty), "second claim of v2 must lose")
    assert(vt.readVersion("t", 2L).count() === 1, "the winner's manifest survives intact")
    // two writers appending through the protocol: both rows land, none drop
    val racer = new Versioned(spark, vt.root)
    racer.commitAppend("t", Seq((100L, "race")).toDF("k", "v"))
    val v = vt.commitAppend("t", Seq((2L, "b")).toDF("k", "v"))
    assert(v === 4L)
    assert(vt.read("t").select("k").as[Long].collect().toSet === Set(1L, 100L, 2L))
  }

  test("vacuum drops unreferenced files but keeps retained versions readable") {
    val vt = new Versioned(spark, tmpRoot())
    vt.commit("t", Seq((1L, "a")).toDF("k", "v"))   // v1 (orphaned by v2)
    vt.commit("t", Seq((2L, "b")).toDF("k", "v"))   // v2
    vt.commitAppend("t", Seq((3L, "c")).toDF("k", "v")) // v3 = v2 files + delta
    val (manifestsGone, filesGone) = vt.vacuum("t", keepLast = 2)
    assert(manifestsGone === 1 && filesGone >= 1, s"($manifestsGone, $filesGone)")
    // kept versions fully readable; vacuumed one is gone
    assert(vt.readVersion("t", 3L).count() === 2)
    assert(vt.readVersion("t", 2L).count() === 1)
    assert(vt.versions("t") === Seq(2L, 3L))
    intercept[Exception] { vt.readVersion("t", 1L).count() }
  }
}
