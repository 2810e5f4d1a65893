package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = vertices.toDF("id")
    val e = edges.toDF("src", "dst")
    Clusters.connectedComponents(v, "id", e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive chain collapses to one cluster; isolated vertex keeps itself") {
    // A≈B and B≈C but no direct A≈C edge — the case pairwise dedup misses
    val got = cc(Seq(1L, 2L, 3L, 9L), Seq((2L, 3L), (1L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("disjoint cliques get distinct minimum-id labels") {
    val got = cc(Seq(1L, 2L, 3L, 10L, 11L, 12L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L)))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
  }

  test("no edges: every vertex is its own cluster") {
    val got = cc(Seq(5L, 6L, 7L), Seq.empty)
    assert(got === Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }

  test("long path needs multiple propagation rounds and still converges") {
    // diameter 7: label 1 must walk the whole path
    val path = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = cc((1L to 8L), path)
    assert(got.values.toSet === Set(1L))
  }

  test("edge direction does not matter (symmetrized internally)") {
    assert(cc(Seq(1L, 2L), Seq((2L, 1L))) === Map(1L -> 1L, 2L -> 1L))
  }

  test("pointer jumping closes a 200-node path in O(log d) rounds, not O(d)") {
    // plain min-propagation needs 199 rounds here; with the label(label(x))
    // shortcut the remaining diameter halves per round, so maxIters = 12
    // either converges or this test fails with the partial labeling
    val n = 200L
    val v = (1L to n).toDF("id")
    val e = (1L to n).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("src", "dst")
    val got = Clusters.connectedComponents(v, "id", e, "src", "dst", maxIters = 12)
      .collect().map(r => r.getLong(1)).toSet
    assert(got === Set(1L), s"path graph must fully collapse within 12 rounds, labels: $got")
  }

  test("randomized graphs match a driver-side union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + trial * 10
      val vertices = (1L to n.toLong)
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1)
      }.filter { case (a, b) => a != b }

      val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min id per component
      val expected = vertices.map { v =>
        val root = find(v)
        v -> vertices.filter(find(_) == root).min
      }.toMap

      assert(cc(vertices, edges) === expected, s"trial $trial: n=$n edges=$edges")
    }
  }
}
