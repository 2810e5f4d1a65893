package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** DATA SELECTION BY IMPORTANCE RESAMPLING scores (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023
  * — the DSIR recipe): score every raw document by how much it looks like
  * a TARGET distribution under hashed n-gram language models,
  * log w(doc) = Σ_f c_f·(log p_target(f) − log p_raw(f)), then keep the
  * top mass. This is the targeted-selection pass next to the
  * quality-classifier filter (q204): the classifier needs labels, DSIR
  * only needs an in-domain sample.
  *
  * ENGINE-EXACT formulation: features are md5-hash buckets
  * ([[Dedup.detTokenHash]] mod `buckets`), counts are add-one smoothed
  * integers, and the log is FLOOR-LOG2 computed as len(bin(x)) − 1 —
  * pure integer in both engines — applied to the cross-multiplied
  * probabilities: log2(t_f/T) − log2(r_f/R) ≈ L(t_f·R) − L(r_f·T).
  * Integer floor-log2 quantizes the classic score to ±1 bit per token —
  * the resolution cost of having a bit-for-bit reproducible selector
  * (rankings at corpus scale are driven by many-token sums where the
  * quantization washes out; ImportanceSpec pins the separation on a
  * planted bilingual corpus).
  *
  * Scale shape: one scan to count (bucket-keyed shuffle, ≤ `buckets`
  * cells out), the tiny count table broadcast back, one scan to score —
  * the raw corpus never shuffles. Overflow envelope: t_f·R and r_f·T
  * must stay < 2⁶³ — fine to ~3·10⁹ total tokens per side; shard the
  * counts and rescale beyond that.
  *
  * Output: (id, score) — higher = more target-like.
  */
object Importance {

  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), s"dsirScores: buckets=$buckets")
    val toks = docs.select(col(idCol).as("__id"), isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("__w"))
      .withColumn("__b", Dedup.detTokenHash(col("__w")) % buckets)
    val counts = toks.groupBy(col("__b"))
      .agg((sum(when(col("__t"), 1L).otherwise(0L)) + 1L).as("tb"),
        (count(lit(1)) + 1L).as("rb"))
    // totals as a 1-row dim (crossJoin of a broadcast scalar — no collect)
    val totals = counts.agg(sum(col("tb")).as("tt"), sum(col("rb")).as("rr"))
    def flog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    toks
      .join(broadcast(counts), "__b")
      .crossJoin(broadcast(totals))
      .withColumn("__s", flog2(col("tb") * col("rr")) - flog2(col("rb") * col("tt")))
      .groupBy(col("__id"))
      .agg(sum(col("__s")).as("score"))
      .select(col("__id").as(idCol), col("score"))
  }

  /** RENDEZVOUS (highest-random-weight) SHARDING (Thaler & Ravishankar
    * 1998): key → the worker with the max md5(key ":" worker) — the
    * consistent-assignment scheme whose defining property is MINIMAL
    * MOVEMENT: adding a worker reassigns only ~1/(k+1) of keys (those
    * whose new worker wins), vs a full reshuffle for `hash mod k`.
    * Deterministic and engine-exact: the argmax is a lexicographic max
    * over md5 hex strings, ties impossible in practice and broken by the
    * larger worker id via the struct order. Pure per-row expression —
    * zero shuffle to assign a 100 TB corpus.
    *
    * Returns `df` with `owner` (0..k−1) appended.
    */
  def withRendezvousOwner(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"withRendezvousOwner: k=$k (hashes are per-row exprs — keep it dim-sized)")
    val scored = array((0 until k).map(w =>
      struct(md5(concat(col(keyCol).cast("string"), lit(":"), lit(w.toString)))
        .as("h"), lit(w.toLong).as("w"))): _*)
    df.withColumn("owner", array_max(scored).getField("w"))
  }
}
