package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance scores and rendezvous sharding. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("dsirScores separates target-vocab docs from off-domain docs") {
    // target domain speaks {alpha..delta}, the rest speaks {wun..fore};
    // two UNSEEN eval docs — one per vocab — must rank in the right order
    val docs = (
      (1 to 10).map(i => (i.toLong, "alpha beta gamma delta alpha beta", true)) ++
      (11 to 30).map(i => (i.toLong, "wun too tree fore wun too", false)) :+
      ((100L, "alpha gamma delta beta gamma alpha", false)) :+
      ((101L, "too fore tree wun fore too", false))
    ).toDF("doc_id", "text", "is_t")
    val scores = Importance.dsirScores(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(100L) > scores(101L),
      s"target-vocab doc must outscore off-domain: ${scores(100L)} vs ${scores(101L)}")
  }

  test("rendezvous sharding: adding a worker moves keys ONLY to the new worker") {
    val keys = (1L to 2000L).toDF("k")
    val o8 = Importance.withRendezvousOwner(keys, "k", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o9 = Importance.withRendezvousOwner(keys, "k", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = o8.keys.filter(k => o8(k) != o9(k)).toSeq
    // the defining HRW property: a key moves iff the NEW worker wins it
    assert(moved.forall(k => o9(k) == 8L), "keys must only ever move to the new worker")
    // expected movement ≈ 1/9 of keys; generous band
    assert(moved.size > 2000 / 20 && moved.size < 2000 / 4,
      s"moved ${moved.size} of 2000 — expected ≈ 1/9")
  }

  test("rendezvous sharding is roughly balanced") {
    val keys = (1L to 4000L).toDF("k")
    val sizes = Importance.withRendezvousOwner(keys, "k", 8)
      .groupBy("owner").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    assert(sizes.min > 300 && sizes.max < 700, s"skewed shards: ${sizes.toSeq}")
  }
}
