package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames (the iterative ones —
  * PageRank, connected components — live in SparkEntry/dedup.Clusters; this
  * object holds the single-pass analytics).
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
}
