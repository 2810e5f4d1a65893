package graft

import graft.graph.Graphs

/** k-core peel and synchronous label propagation on planted graphs where
  * the answer is known by construction. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  test("kcorePeel: a 4-clique survives k=3, its tail is peeled") {
    // 4-clique {1,2,3,4} + path tail 4-5-6
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val out = Graphs.kcorePeel(g, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out.values.toSet === Set(3L)) // induced degrees inside the clique
  }

  test("kcorePeel reaches its fixpoint on the planted graph") {
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val r2 = Graphs.kcorePeel(g, k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r3 = Graphs.kcorePeel(g, k = 3, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r2 === r3)
  }

  test("kcorePeel: k above the max degree empties the graph") {
    val g = edges((1L, 2L), (2L, 3L))
    assert(Graphs.kcorePeel(g, k = 5, rounds = 2).count() === 0L)
  }

  test("labelPropagate: disjoint triangles converge to their min id") {
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val out = Graphs.labelPropagate(g, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("bfsLayers: hop minima on a path with one seed; the far tail is unreached") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L).toDF("s")
    val out = Graphs.bfsLayers(g, seeds, "s", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 is 4 hops away
  }

  test("bfsLayers: multi-source takes the nearer seed") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L, 5L).toDF("s")
    val out = Graphs.bfsLayers(g, seeds, "s", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("labelPropagate tie-break: most frequent wins, then smallest label") {
    // star: center 5 with leaves 1..4; round 1 gives every leaf label 5 and
    // the center label 1 (4-way tie → min); round 2: leaves see only the
    // center's label 1; center sees {5,5,5,5} → 5
    val g = edges((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    val r1 = Graphs.labelPropagate(g, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 1L))
    val r2 = Graphs.labelPropagate(g, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
  }
}
