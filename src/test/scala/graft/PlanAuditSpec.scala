package graft

import org.apache.spark.sql.execution.SimpleMode

/** WHOLE-SURFACE plan hygiene: every declared query's physical plan is
  * scanned for the two patterns that kill jobs at 100 TB — cartesian/
  * nested-loop joins over non-trivial inputs, and single-partition window
  * sorts over non-domain-bounded data. PlanSpec pins the good plans of
  * specific queries; this audit guarantees NO query regresses into a known
  * anti-pattern without either failing CI or being added here WITH ITS
  * JUSTIFICATION — the allowlist is documentation, not an escape hatch.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries allowed to contain a CartesianProduct / BroadcastNestedLoopJoin
    * and why. One-row dimension/threshold crossJoins are detected and
    * auto-allowed separately (the dominant legitimate shape: a computed
    * scalar joined onto every row / a tiny stats row assembled at the end).
    */
  private val nestedLoopAllowed: Map[String, String] = Map(
    "q94_cross_join" -> "IS the cross-join operator (date-spine x priority grid, both sides tiny dims)",
    "q29_range_join" -> "band predicate over binned keys; NLJ only inside a bin pair",
    "q174_sorted_neighborhood" -> "lead() band generates candidates; no join at all - flagged for the 1-row guard only",
    "q35_jaccard_pairs" -> "RETIRED brute-force oracle twin (not benched); exact all-pairs is its definition",
    "q254_containment_pairs" -> "RETIRED brute-force oracle twin of q255 (not benched); exact all-pairs is its definition",
    "q41_embed_neardup" -> "RETIRED brute-force oracle twin of q161",
    "q137_semantic_dedup" -> "RETIRED brute-force oracle twin of q162",
    "q153_label_agreement" -> "RETIRED brute-force oracle twin of q163",
    "q38_ann_brute" -> "designed brute baseline: |Q|-bounded query set broadcast against the corpus (DESIGN: the |Q|-small regime)",
    "q208_knn_classify" -> "exact-kNN vote form rides q38's brute producer (same |Q|-bounded broadcast); the vote itself is equi-join + agg, and pqTopK slots in as the producer at scale",
    "q43_ann_ivf" -> "nprobe-cell candidate join against the nlist-bounded centroid dim",
    "q199_ann_ivfpq" -> "probe pass crossJoins the nlist-bounded centroid dim (broadcast); codes-only cell join and broadcast re-rank are equi-joins",
    "q135_source_overlap" -> "O(sources^2) matrix over per-source 1-row-per-source aggregates",
    "q214_centroid_shard" -> "k-bounded centroid dim (limit 8) broadcast against the corpus - the IVF coarse-assign shape (q43's regime)",
    "q217_kmeans_quantized" -> "k-bounded centroid dim (k=8 LocalRelation) broadcast against the corpus each Lloyd round - q214's coarse-assign shape",
    "q218_semdedup" -> "k-bounded seed-centroid dim broadcast for shard assignment; the dedup pair search itself is a shard equi-join",
    "q221_mmr_rerank" -> "|Q|-bounded query sample broadcast against the corpus (q38's brute-candidate regime); every MMR selection step is a window + equi-join",
    "q224_ann_ivf_det" -> "nlist-bounded centroid dim broadcast for cell assignment and query probing (q43's regime); the cell search itself is a cluster equi-join",
    "q226_semdedup_far" -> "q218's shard shape - k-bounded seed-centroid dim broadcast; the dedup pair search is a shard equi-join",
    "q232_split_leakage" -> "q218's shard shape - k-bounded seed-centroid dim broadcast; the cross-split pair search is a shard equi-join + two id equi-joins",
    "q244_shard_purity" -> "q214's shard shape - k-bounded seed-centroid dim broadcast for assignment; the purity rollup is label-keyed aggregation",
    "q289_quality_calibrated" -> "isotonic step-table lookup: the calibration table (bounded by the labeled slice, Isotonic's 2^16 envelope) broadcast as a range join - the histogram-bucketing shape; output rows = input rows",
    "q292_calibration_ece" -> "q289's step-table range join inherited (the ECE rollup composes on q289's calibrated output); the rollup itself is an equi-join + aggregation")

  /** Queries allowed a single-partition (unpartitioned ORDER BY) window and
    * the domain bound that justifies it. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q178_concurrency_sweep" -> "window runs AFTER per-date aggregation: O(calendar days) rows at any SF",
    "q182_token_budget" -> "global window over score BUCKETS only (O(1000) rows); doc cumsum is bucket-partitioned",
    "q16_topk" -> "TakeOrderedAndProject, not a window - flagged by the Sort matcher only",
    "q58_quantiles" -> "exact percentile aggregate requires a global view; partial_percentile combines map-side",
    "q119_percentile_disc" -> "rank-based percentiles need the group-global rank; partitioned BY group",
    "q126_deciles" -> "ntile over the global order is the operator's definition; input is one integer column",
    "q92_minmax_scale" -> "global min/max frame over a single measure column",
    "q87_zscore_outliers" -> "global moments frame over a single measure column",
    "q115_normalize" -> "global min/max frame, single measure",
    "q123_ratio_to_report" -> "ratio-to-report total frame over the (tiny) group aggregate",
    "q152_bpe_merge" -> "merge ranking over the O(vocab) pair table",
    "q90_vocab_topn" -> "top-N over the O(vocab) term table",
    "q130_bigram_top" -> "top-N over the O(vocab^2-bounded) bigram table",
    "q139_tfidf" -> "top-N over the O(vocab) df table",
    "q131_corpus_composition" -> "share-of-total over the O(groups) aggregate",
    "q151_mixture_quota" -> "largest-remainder ranking over the O(groups) quota table",
    "q136_histogram" -> "bin share-of-total over the O(bins) aggregate",
    "q148_key_cardinality" -> "histogram over O(distinct multiplicities) rows",
    "q122_islands" -> "whole-table window over the AGGREGATED island groups, not raw rows (doc-comment pinned)",
    "q124_cumulative_users" -> "running distinct-users over per-DAY aggregates: O(calendar days) rows at any SF",
    "q125_session_funnel" -> "funnel share-of-total over the O(steps) aggregate",
    "q66_profile" -> "profile assembles a handful of per-column stat rows",
    "q104_incremental_stats" -> "merge of O(partitions) partial-stat rows",
    "q103_snapshot_diff" -> "diff summary over O(changed keys at tiny sf) - bounded by construction here",
    "q165_versioned_timetravel" -> "two 1-row snapshot aggregates unioned",
    "q266_ccnet_buckets" -> "false conjunction: the SinglePartition exchange is the KN model's 1-row totals aggregate; the rank window itself is PARTITIONED BY lang",
    "q169_stream_versioned" -> "post-drain batch aggregate; union of tiny slices",
    "q175_versioned_merge" -> "three 1-row slice aggregates unioned",
    "q176_versioned_delta" -> "four 1-row increment aggregates unioned",
    "q181_corpus_shuffle" -> "rank pivot runs inside 16 shard partitions; flagged only when AQE coalesces the tiny test input to one partition",
    "q195_seq_pack" -> "global window over the <=1025 chunk-sum rows only (chunk width scales with max id); doc cumsum is chunk-partitioned",
    "q197_bm25_topk" -> "the SinglePartition exchange is the 32-row query-term limit (per-task top-32 first); the ranking window itself hash-partitions by query_id")

  /** Left(failure) when the query can't even be BUILT (loader/testdata
    * regression — reported as its own violation class, so one broken
    * builder can't silence the whole-surface audit: exactly r5's failure
    * mode, where a dead events loader blinded the audit for 26 queries),
    * Right(findings) otherwise. */
  private def audit(name: String): Either[String, Seq[String]] =
    scala.util.Try(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(SimpleMode)) match {
      case scala.util.Failure(e) =>
        Left(s"$name: UNBUILDABLE (audit skipped): ${e.toString.linesIterator.next()}")
      case scala.util.Success(plan) => Right(auditPlan(name, plan))
    }

  private def auditPlan(name: String, plan: String): Seq[String] = {
    val findings = scala.collection.mutable.Buffer.empty[String]
    val nlj = plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin")
    // one-row scalar crossJoins are fine anywhere: every such join in the
    // repo broadcasts a grand aggregate (HashAggregate with NO grouping
    // keys = a 1-row relation) onto the fact side — the threshold/stats
    // pattern. A CartesianProduct never qualifies.
    val oneRowScalar = plan.contains("HashAggregate(keys=[], ") ||
      plan.contains("SortAggregate(key=[], ")
    if (nlj && !nestedLoopAllowed.contains(name) &&
        !(oneRowScalar && !plan.contains("CartesianProduct")))
      findings += s"$name: nested-loop/cartesian join"
    if ((plan.contains("Exchange SinglePartition") && plan.contains("Window")) &&
        !globalWindowAllowed.contains(name))
      findings += s"$name: single-partition window"
    findings.toSeq
  }

  test("no query plans a cartesian join or an unjustified global window") {
    // batch-plannable surface: streaming queries execute their drain on
    // construction and return a post-drain batch table - audited as such.
    // Per-query Try: unbuildable queries surface as their own failure list
    // while every buildable plan is STILL audited.
    val results = SparkEntry.queries.keys.toSeq.sorted.map(audit)
    val unbuildable = results.collect { case Left(f) => f }
    val violations = results.collect { case Right(fs) => fs }.flatten
    assert(unbuildable.isEmpty && violations.isEmpty,
      "plan-audit violations:\n" + (unbuildable ++ violations).mkString("\n"))
  }

  test("the allowlists only name real queries (no stale entries)") {
    val stale = (nestedLoopAllowed.keySet ++ globalWindowAllowed.keySet) -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }
}
