package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster canonicalization: turn pairwise near-duplicate matches
  * (the output of MinHash-LSH / exact-Jaccard verification — `Dedup`'s pair
  * producers) into connected components, so each group of mutual near-dups
  * collapses to ONE canonical representative (the minimum id).
  *
  * The reference dedups row-identical records only (`SELECT DISTINCT *`,
  * e.g. reference covid_transforms.py:43-47); clustering TRANSITIVE
  * near-duplicates is the corpus-level generalization a training-data
  * pipeline needs — A≈B and B≈C must collapse to one keeper even when A and
  * C don't match directly.
  */
object Clusters {

  /** Connected components by min-label propagation WITH POINTER JUMPING.
    *
    * Each vertex starts labeled with its own id; every round each vertex
    * takes the minimum among its own label, its neighbors' labels, AND its
    * label's label (the shortcutting step — label(label(x)) is always a
    * node of the same component, so the candidate set stays sound while
    * effective propagation distance DOUBLES per round). Fixpoint =
    * components in O(log diameter) rounds, the same asymptotic as the
    * alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014) with less
    * machinery: one extra equi-join per round.
    *
    * Why it matters: near-dup graphs are dense little cliques (diameter
    * 2–3, where plain propagation already converges in 2 rounds and the
    * extra join is ~free), but RECORD-LINKAGE graphs chain — A~B~C~… — and
    * plain min-propagation walks them one hop per round (measured: 21
    * rounds on the sf1 ER graph, each a join + agg + checkpoint; with
    * shortcutting the same graph closes in 8 — the number the in-loop
    * comment, DESIGN.md and the r6 bench all agree on).
    *
    * Scale notes for the 100 TB regime:
    *  - the per-round shuffle is keyed on vertex id both in the neighbor
    *    join and the min-aggregation, so AQE reuses one exchange layout;
    *  - checkpointing after each round truncates the lineage — without it
    *    round k replays rounds 1..k-1 and the job goes quadratic;
    *  - DURABILITY: with `checkpointDir` set, rounds checkpoint to RELIABLE
    *    storage (`Dataset.checkpoint`) — an executor lost mid-iteration
    *    recomputes its partitions from the checkpoint files, so the job
    *    survives node loss, which a 1000-executor×hours run must assume.
    *    Unset (local mode / tests), it falls back to `localCheckpoint`:
    *    faster (no DFS write), but executor-local blocks die with the
    *    executor — never run a production CC without a checkpoint dir;
    *  - the edge set is symmetrized once and cached: it is reused every
    *    round and never grows;
    *  - convergence is detected with a `limit(1)` existence probe on changed
    *    labels, not a full count — the probe short-circuits.
    *
    * @param vertices      one row per vertex (extra columns ignored)
    * @param edges         undirected pair list (extra columns ignored)
    * @param checkpointDir reliable checkpoint location (HDFS/object store);
    *                      None = executor-local lineage truncation only
    * @return (`idCol`, cluster_id) — cluster_id = min vertex id reachable
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val sc = vertices.sparkSession.sparkContext
    // setCheckpointDir stores dir/<random-UUID>, so equality against the
    // requested root can never hold — compare by prefix or every call would
    // mint (and abandon) a fresh checkpoint subdirectory (r4 advisor).
    checkpointDir.foreach { dir =>
      if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
    }
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    // ONE pass emitting both orientations (explode, not union-of-selects —
    // the latter evaluated the caller's pair-producer twice), persisted
    // PARTITIONED BY dst: the per-round neighbor join keys sym on dst, so
    // the edge side's exchange is paid once here, not once per round
    // (r13, guide §2.4; the Graphs.pagerankInt layout).
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("dst"))
      .cache()
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val viaNeighbors = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("cluster_id"))
      // pointer jumping: x also considers label(label(x)) — shuffles the
      // label table once on cluster_id; halves the remaining diameter every
      // round, which is what turns a 21-round chain graph into 8. Skipped
      // in round 1, where labels are still the identity and the jump is a
      // no-op by construction (keeps the clique-graph fast path at exactly
      // the old per-round cost until a second round is even needed).
      val withParent =
        if (iter == 0) labels.union(viaNeighbors)
        else labels.union(viaNeighbors).union(
          labels.select(col("id"), col("cluster_id").as("__p"))
            .join(labels.select(col("id").as("__p"), col("cluster_id").as("__pp")), "__p")
            .select(col("id"), col("__pp").as("cluster_id")))
      // The changed flag rides along INSIDE the materialized round — the
      // convergence probe never needs a second pass over the join.
      // (groupBy(id) and the prior round's materialization share the id
      // hash-partitioning, so the old-label join below adds no exchange.)
      val roundPlan = withParent
        .groupBy("id").agg(min("cluster_id").as("new_cid"))
        .join(labels.select(col("id"), col("cluster_id").as("old_cid")), "id")
        .select(col("id"), col("new_cid").as("cluster_id"),
          (col("new_cid") =!= col("old_cid")).as("__changed"))
      if (checkpointDir.isDefined) {
        // reliable path: full checkpoint job, then a shuffle-free probe
        // over the checkpointed rows (durability requires the write-out)
        val next = truncate(roundPlan)
        converged = next.filter(col("__changed")).limit(1).count() == 0L
        labels = next.select("id", "cluster_id")
      } else {
        // local path (r13): ONE job per round instead of two — a LAZY local
        // checkpoint truncates the logical plan immediately (each round
        // references `labels` three times, so without truncation the plan
        // TREE grows 3^rounds and analysis itself OOMs on chain graphs),
        // and the convergence AGGREGATE is the materializing action (a
        // full scan, so every partition checkpoints — a limit-probe would
        // short-circuit and leave partitions uncomputed).
        val next = roundPlan.localCheckpoint(false)
        val anyChanged = next.agg(coalesce(max(col("__changed")), lit(false)))
          .head().getBoolean(0)
        converged = !anyChanged
        labels = next.select("id", "cluster_id")
      }
      iter += 1
    }
    sym.unpersist()
    // operational breadcrumb: iteration count IS the diameter bound — a
    // jump here after a corpus change explains a wall-clock regression
    // before any profiler does (each round = 1 join + 1 agg + 1 checkpoint).
    // info-level, not stderr: a library entry point must not print
    // unconditionally.
    org.slf4j.LoggerFactory.getLogger("graft.dedup.Clusters")
      .info(s"connectedComponents: rounds=$iter converged=$converged")
    labels.select(col("id").as(idCol), col("cluster_id"))
  }
}
