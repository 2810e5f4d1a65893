package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames. Connected components
  * (the other iterative workload) lives in dedup.Clusters; this object
  * holds triangle counting and the integer-mass PageRank.
  */
object Graphs {

  /** EXACT TRIANGLE COUNT via degree-ordered edge orientation — the standard
    * scale algorithm (public literature: Cohen's MapReduce triangle counting;
    * the node-iterator++ idea): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges from each
    * source's out-neighborhood, and close them with one equi-join back on the
    * oriented edge set. Each triangle is counted EXACTLY once — its
    * order-minimal vertex is the only one with out-edges to the other two.
    *
    * Why this survives 100 TB where the naive form dies: wedge volume is
    * Σ C(outdeg(v), 2), and degree-ordering bounds every out-degree by
    * O(√m) (a vertex beats only vertices of ≥ its degree), so wedges are
    * O(m^1.5) worst-case and far less on real skewed graphs — the hub that
    * would generate C(10⁶, 2) wedges as a source generates none, because all
    * its edges point INTO it. Every step is an equi-join or hash aggregate
    * (shuffles on vertex/pair keys); no theta join, no broadcast of anything
    * O(V).
    *
    * @param edges undirected edges as columns (`src`, `dst`); duplicates,
    *              self-loops, and both orientations tolerated (canonicalized
    *              and distinct-ed here).
    * @return one row: n_vertices, n_edges, n_triangles
    */
  def triangleCount(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // canon and oriented are each consumed by SEVERAL downstream joins;
    // without persistence Spark recomputes the full edge-derivation subtree
    // per consumer (measured 2× on the bench). MEMORY_AND_DISK keeps the
    // O(m) edge list off the recompute path; entries age out via LRU. At
    // cluster scale replicated persist or a reliable checkpoint is the same
    // one-line seam.
    val canon = edges
      .select(least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // Orient by (degree, id): ordKey packs both so one struct compare decides.
    val withOrd = canon
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    val ordA = struct(col("da").as("d"), col("a").as("v"))
    val ordB = struct(col("db").as("d"), col("b").as("v"))
    val oriented = withOrd.select(
      when(ordA < ordB, col("a")).otherwise(col("b")).as("u"),
      when(ordA < ordB, col("b")).otherwise(col("a")).as("w"),
      when(ordA < ordB, ordB).otherwise(ordA).as("w_ord"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // EDGE-ITERATOR form: for each oriented edge (u, w), the triangles whose
    // order-minimal vertex is u and middle vertex is w are exactly
    // |N⁺(u) ∩ N⁺(w)| — each triangle counted once, at its unique (min,
    // mid) edge. Materializing adjacency ARRAYS and intersecting per edge
    // moves the same information as the wedge self-join in O(m) rows
    // instead of O(m^1.5) wedge rows (measured 2× on the bench); per-row
    // intersect cost is O(outdeg), and degree-ordering caps outdeg at
    // O(√m), so no row is pathological.
    // inner joins: an edge whose endpoint has no out-neighbors closes
    // nothing. Adjacency lists are sorted+distinct by construction, so the
    // codegen'd merge-scan counter replaces size(array_intersect(...))'s
    // per-row hash set + result-array allocation.
    val adj = oriented.groupBy(col("u")).agg(sort_array(collect_list(col("w"))).as("nbrs"))
    val tri = oriented.select(col("u"), col("w"))
      .join(adj, Seq("u"))
      .join(adj.select(col("u").as("w"), col("nbrs").as("w_nbrs")), Seq("w"))
      .agg(sum(graft.functions.ArrayExprs.sorted_intersect_count(
        col("nbrs"), col("w_nbrs"))).as("n_triangles"))
    // sum(...) is null on an edgeless graph — normalize to 0
    val triN = tri.select(coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))

    deg.agg(count(lit(1)).as("n_vertices")).crossJoin(
      canon.agg(count(lit(1)).as("n_edges"))).crossJoin(triN)
  }

  /** INTEGER-MASS PAGERANK (Page, Brin, Motwani & Winograd 1999) over the
    * SYMMETRIZED distinct edge set, ENGINE-EXACT: the float power
    * iteration no two engines reproduce bit-for-bit becomes pure integer
    * arithmetic by carrying rank as MASS out of a fixed budget —
    *
    *   m₀(v)    = ⌊total / N⌋
    *   mₜ₊₁(v) = ⌊15·⌊total/N⌋/100⌋ + ⌊85·Σ_{u→v}⌊mₜ(u)/deg(u)⌋/100⌋
    *
    * i.e. damping 0.85 and the uniform teleport both as floor divisions,
    * mirrored verbatim by any SQL engine. Each ⌊·⌋ loses < 1 unit of
    * mass per node per round — with total = 10¹² the relative error vs
    * float PageRank is ≤ ~N·iters/total, noise for any ranking use, and
    * the DEFINED semantics (this exact recurrence) is what the oracle
    * checks. Symmetrization means no dangling nodes by construction
    * (every vertex in V has out-degree ≥ 1), which is the honest variant
    * for similarity/co-occurrence graphs; directed graphs with dangling
    * mass need a redistribution term this operator deliberately omits.
    *
    * Scale shape per iteration: one equi-join of the rank vector with the
    * cached edge list on the vertex key + one aggregation keyed the same
    * way — the classic message-passing round, the same exchange layout
    * every round (AQE reuses it). The edge list and degrees are persisted
    * once (consumed by every round; the triangleCount precedent). The
    * iteration chain is linear — each mₜ feeds only mₜ₊₁ — so the plan
    * tower executes each round exactly once, no checkpointing needed at
    * these depths (checkpoint every ~10 rounds at 100 TB).
    *
    * Output: (node, mass) — bigint mass out of `total`.
    */
  def pagerankInt(edges0: DataFrame, src: String = "src", dst: String = "dst",
                  iters: Int = 3, total: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && iters <= 50, s"pagerankInt: iters=$iters")
    import org.apache.spark.storage.StorageLevel
    def fdiv(a: Column, b: Column): Column = call_function("div", a, b)
    // symmetrize in ONE pass over canon (explode, not unionAll-of-selects —
    // the latter evaluated the whole upstream edge derivation twice; r13),
    // and persist PARTITIONED BY u: every round's message join and the
    // degree aggregate are keyed on u, so the exchange of the (big) edge
    // list is paid once here instead of once per round (guide §2.4).
    val edges = symmetrize(edges0, src, dst)
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = deg.select(col("u").as("node"))
    val nn = verts.agg(count(lit(1)).as("n"))
    val seed = fdiv(lit(total), col("n"))
    var pr = verts.crossJoin(broadcast(nn)).select(col("node"), seed.as("m"))
    for (_ <- 1 to iters) {
      val inbox = pr.join(deg, pr("node") === deg("u"))
        .select(col("node").as("u0"), fdiv(col("m"), col("d")).as("share"))
        .join(edges, col("u0") === col("u"))
        .groupBy(col("v")).agg(sum(col("share")).as("inm"))
      pr = verts.crossJoin(broadcast(nn))
        .join(inbox, col("node") === col("v"), "left")
        .select(col("node"),
          (fdiv(lit(15L) * seed, lit(100L)) +
            fdiv(lit(85L) * coalesce(col("inm"), lit(0L)), lit(100L))).as("m"))
    }
    pr.select(col("node"), col("m").as("mass"))
  }

  /** Symmetrized distinct directed edge list (u, v) from an undirected
    * input — self-loops dropped, both orientations emitted once. The
    * canonical pre-pass of every iterative operator here. */
  private def symmetrize(edges0: DataFrame, src: String, dst: String): DataFrame = {
    val canon = edges0
      .select(least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // ONE pass emitting both orientations (r13, guide §1.2 "don't compute
    // things twice"): the old unionAll(select, select) evaluated `canon` —
    // and therefore the caller's whole edge-derivation subtree (q231: a
    // lineitem self-join) — TWICE before the first persist could help.
    // explode duplicates each row after computing it once; row order is
    // irrelevant to every consumer (joins/aggregates).
    canon.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** BOUNDED K-CORE PEEL (Seidman 1983; the Batagelj–Zaveršnik peeling
    * family): `rounds` synchronous rounds of "drop every vertex whose
    * degree in the current induced subgraph is < k". The k-core is the
    * fixpoint; a FIXED round count keeps the semantics deterministic and
    * oracle-unrollable (the house discipline of the PageRank/CC unrolls),
    * and on real graphs the peel converges in a handful of rounds —
    * KcoreSpec asserts the fixpoint is reached on the test corpus, and
    * callers at 100 TB loop until a round removes nothing (same join
    * shape per round).
    *
    * All-integer: membership is a degree threshold, no scores — so the
    * surviving set and its induced degrees are engine-exact.
    *
    * Scale shape per round: two semi-joins of the persisted edge list
    * against the current alive set (vertex-keyed, the same exchange
    * layout every round) + one count aggregate. Nothing O(V) is ever
    * broadcast or collected.
    *
    * Output: (node, core_deg) — the vertices alive after `rounds` peels
    * with their induced degree at that point.
    */
  def kcorePeel(edges0: DataFrame, k: Int, rounds: Int,
                src: String = "src", dst: String = "dst"): DataFrame = {
    require(k >= 1, s"kcorePeel: k=$k")
    require(rounds >= 1 && rounds <= 16, s"kcorePeel: rounds=$rounds")
    import org.apache.spark.storage.StorageLevel
    // Peeling is MONOTONE: once a vertex is dropped, every edge touching it
    // is gone for good — so each round filters the PREVIOUS round's edge
    // list, not the full graph. Rounds get strictly cheaper as the graph
    // shrinks (the full list is touched exactly once); each stage persists
    // because two joins + the next round consume it.
    //
    // CACHE LIFETIME (r7 advisor, adjudicated in r8): up to rounds+1 edge
    // generations stay persisted until the session's LRU evicts them —
    // DELIBERATE. The alternative (materialize each round with a count and
    // unpersist the superseded frame) bounds the footprint at 2 generations
    // but measured 1.4 s → 6.7 s at sf0.1 (the per-round jobs break the
    // single fused DAG). rounds ≤ 16 by contract and generations SHRINK
    // monotonically, so the pinned total is bounded by ~2× the first
    // generation; MEMORY_AND_DISK degrades to disk, never OOM. Callers
    // running many kcore calls in one session can spark.catalog.clearCache.
    var edges = symmetrize(edges0, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    var alive = edges.groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
      .select(col("u").as("node"), col("core_deg"))
    for (_ <- 1 to rounds) {
      val keep = alive.filter(col("core_deg") >= k).select(col("node"))
      edges = edges
        .join(keep.select(col("node").as("u")), "u")
        .join(keep.select(col("node").as("v")), "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
      alive = edges.groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
        .select(col("u").as("node"), col("core_deg"))
    }
    alive
  }

  /** MULTI-SOURCE BFS LAYERS: shortest hop distance from ANY seed vertex,
    * `rounds` synchronous frontier expansions — the reachability /
    * blast-radius primitive (how far does contamination spread from a set
    * of known-bad documents through a similarity graph?). Distances are
    * pure integer minima, so the layer assignment after any fixed round
    * count is engine-exact and the oracle replays every round; vertices
    * beyond `rounds` hops are absent (run more rounds or loop to
    * fixpoint at the caller — diameter rounds suffice).
    *
    * Scale shape per round: one edge-join shipping the current frontier's
    * distances + one min-aggregate keyed by vertex — the PageRank
    * exchange layout on the persisted edge list.
    *
    * Output: (node, dist) for every vertex within `rounds` hops of a seed.
    */
  def bfsLayers(edges0: DataFrame, seeds: DataFrame, seedCol: String, rounds: Int,
                src: String = "src", dst: String = "dst"): DataFrame = {
    require(rounds >= 0 && rounds <= 16, s"bfsLayers: rounds=$rounds")
    import org.apache.spark.storage.StorageLevel
    val edges = symmetrize(edges0, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    // FRONTIER expansion, not whole-set relaxation: a BFS distance is final
    // the round it is first assigned (hop minimality), so each round joins
    // the edge list against only the vertices reached LAST round and
    // anti-joins out everything already labeled. Work per round is
    // O(edges touching the frontier), not O(edges × |reached so far|) —
    // the difference between 6 s and 2 s at bench scale, and between
    // feasible and quadratic on a 100 TB similarity graph where the
    // reached set saturates after two hops.
    // CACHE LIFETIME (r7 advisor, adjudicated in r8): each round's frontier
    // stays persisted until LRU eviction — DELIBERATE. Materializing every
    // round to unpersist the predecessor measured 0.5 s → 3.9 s at sf0.1
    // (the per-round count jobs break the fused DAG); frontiers SHRINK as
    // the reachable set saturates, rounds ≤ 16 by contract, and
    // MEMORY_AND_DISK never OOMs. Long-lived sessions reclaim via LRU or
    // spark.catalog.clearCache — same adjudication as kcorePeel above.
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = dist
    for (r <- 1 to rounds) {
      val next = edges
        .join(frontier.select(col("node").as("u")), "u")
        .select(col("v").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      dist = dist.unionByName(next)
      frontier = next
    }
    dist
  }

  /** SYNCHRONOUS LABEL PROPAGATION (Raghavan, Albert & Kumara 2007) with
    * deterministic tie-breaks, `rounds` rounds: every vertex starts
    * labeled with its own id; each round it adopts the most frequent
    * label among its neighbors, ties to the SMALLEST label — one
    * struct-max argmax, no RNG, no visit order — so community
    * assignments after any fixed round count are engine-exact and the
    * oracle replays every round. (Classic LPA randomizes update order to
    * dodge bipartite oscillation; fixed-round synchronous + min-label
    * ties is the reproducible variant a data pipeline wants — near-dup
    * similarity graphs converge in 2–3 rounds.)
    *
    * Scale shape per round: one edge-join to ship neighbor labels + two
    * vertex-keyed aggregations (count, argmax) — the PageRank exchange
    * layout, reused every round on the persisted edge list.
    *
    * Output: (node, label) after `rounds` rounds.
    */
  def labelPropagate(edges0: DataFrame, rounds: Int,
                     src: String = "src", dst: String = "dst"): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"labelPropagate: rounds=$rounds")
    import org.apache.spark.storage.StorageLevel
    // persist partitioned by u — the per-round neighbor join's key — so the
    // edge side never re-exchanges (guide §2.4; the pagerankInt layout)
    val edges = symmetrize(edges0, src, dst)
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      labels = edges
        .join(labels.select(col("node").as("u"), col("label")), "u")
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("v").as("node"), (-col("m.neg")).as("label"))
    }
    labels
  }
}
