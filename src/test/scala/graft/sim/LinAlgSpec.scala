package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LinAlg: integer Gram / covariance / power-iteration PCA — hand-computed
  * tiny cases plus a driver-side reference replay on real embeddings. */
class LinAlgSpec extends SparkSpec {
  import spark.implicits._

  private def tiny = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")

  test("gramUpperQuantized matches the hand-computed 2x2 case") {
    val g = LinAlg.gramUpperQuantized(tiny, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // q = [[1024, 0], [1024, 2048]]
    assert(g((0L, 0L)) === 1024L * 1024 + 1024L * 1024)
    assert(g((0L, 1L)) === 1024L * 2048)
    assert(g((1L, 1L)) === 2048L * 2048)
    assert(g.size === 3) // upper triangle only
  }

  test("covarianceUpperQuantized = n*Sxy - Sx*Sy on the 2x2 case") {
    val c = LinAlg.covarianceUpperQuantized(tiny, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // sx0 = 2048, sx1 = 2048, n = 2
    assert(c((0L, 0L)) === 2L * 2097152 - 2048L * 2048)
    assert(c((0L, 1L)) === 2L * 2097152 - 2048L * 2048)
    assert(c((1L, 1L)) === 2L * 4194304 - 2048L * 2048)
  }

  test("gram matrix on real embeddings matches a driver-side reference") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = emb.collect().map(_.getSeq[Float](1).toArray)
    val dim = rows.head.length
    val ref = Array.ofDim[Long](dim, dim)
    rows.foreach { v =>
      val q = v.map(x => math.round(x.toDouble * 1024))
      for (i <- 0 until dim; j <- i until dim) ref(i)(j) += q(i) * q(j)
    }
    val got = LinAlg.gramUpperQuantized(emb, "embedding")
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
    assert(got.size === dim * (dim + 1) / 2)
    got.foreach { case ((i, j), s) => assert(s === ref(i)(j), s"cell ($i, $j)") }
  }

  test("pcaProjectQuantized replays the integer power iteration exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dim = rows.head._2.length
    val g = Array.ofDim[Long](dim, dim)
    val qs = rows.map { case (id, v) => id -> v.map(x => math.round(x.toDouble * 1024)) }
    qs.foreach { case (_, q) =>
      for (i <- 0 until dim; j <- 0 until dim) g(i)(j) += q(i) * q(j)
    }
    var v = Array.fill(dim)(1024L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      if (m != 0L) v = w.map(x => x * 1024L / m)
    }
    val refProj = qs.map { case (id, q) =>
      id -> (0 until dim).map(d => q(d) * v(d)).sum }.toMap
    val got = LinAlg.pcaProjectQuantized(emb, "vec_id", "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refProj)
  }

  test("pcaProjectQuantized finds a planted dominant direction") {
    // 20 vectors hugging axis 0, small noise on axis 1 — the top PC must
    // put (almost) all its weight on dim 0, so projections order by x
    val planted = (1 to 20).map(i =>
      (i.toLong, Array(i.toFloat, (i % 3 - 1) * 0.01f))).toDF("vec_id", "embedding")
    val proj = LinAlg.pcaProjectQuantized(planted, "vec_id", "embedding", iters = 3)
      .orderBy(abs(col("proj")).desc).collect()
    assert(math.abs(proj.head.getLong(0)) === 20L) // largest |x| wins
  }

  test("empty input with caller-supplied nRows fails with a named error, not a bare probe crash") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      LinAlg.pcaProjectQuantized(empty, "vec_id", "embedding", iters = 2, nRows = 100L)
    }
    assert(ex.getMessage.contains("empty input"), ex.getMessage)
  }

  test("all-zero corpus keeps the seed vector (m = 0 guard)") {
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = LinAlg.pcaProjectQuantized(zeros, "vec_id", "embedding", iters = 2).collect()
    assert(out.length === 1 && out.head.getLong(1) === 0L)
  }

  test("pca2ProjectQuantized replays the full integer deflation exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dim = rows.head._2.length
    val qs = rows.map { case (id, v) => id -> v.map(x => math.round(x.toDouble * 1024)) }
    def power(vs: Array[Array[Long]]): Array[Long] = {
      val g = Array.ofDim[Long](dim, dim)
      vs.foreach(q => for (i <- 0 until dim; j <- 0 until dim) g(i)(j) += q(i) * q(j))
      var v = Array.fill(dim)(1024L)
      for (_ <- 1 to 3) {
        val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
        val m = w.map(math.abs).max
        if (m != 0L) v = w.map(x => x * 1024L / m)
      }
      v
    }
    val v1 = power(qs.map(_._2))
    val nv = v1.map(x => x * x).sum
    val resid = qs.map { case (id, q) =>
      val d1 = (0 until dim).map(d => q(d) * v1(d)).sum
      (id, d1, Array.tabulate(dim)(d => (q(d) * nv - v1(d) * d1) / (1L << 24)))
    }
    val v2 = power(resid.map(_._3))
    val ref = resid.map { case (id, d1, r) =>
      id -> ((d1, (0 until dim).map(d => r(d) * v2(d)).sum)) }.toMap
    val got = LinAlg.pca2ProjectQuantized(emb, "vec_id", "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === ref)
  }

  test("pca2ProjectQuantized recovers a planted second direction") {
    // axis 0 dominates variance; axis 1 carries a smaller planted signal —
    // after deflation, proj2 must order by the axis-1 coordinate
    val planted = (1 to 30).map(i =>
      (i.toLong, Array(i * 10.0f, (i % 5 - 2) * 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = LinAlg.pca2ProjectQuantized(planted, "vec_id", "embedding", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byP2 = out.sortBy(p => math.abs(p._2)).reverse.head._1
    // ids with i%5==0 or 4 carry the extreme axis-1 values (±2)
    assert((byP2 % 5 == 0) || (byP2 % 5 == 4), s"extreme proj2 at id $byP2")
  }

  test("meanShiftQuantized: hand-computed two-sample shift numerators") {
    // A = {id 1}: q = [1024, 0]; B = {ids 2, 3}: q = [0, 1024], [2048, 1024]
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(2.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = LinAlg.meanShiftQuantized(df, "embedding", col("vec_id") === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // dim 0: nB·sA − nA·sB = 2·1024 − 1·2048 = 0 (means equal: 1.0 vs 1.0)
    assert(out(0L) === ((1L, 2L, 0L)))
    // dim 1: 2·0 − 1·2048 = −2048 (A mean 0 below B mean 1)
    assert(out(1L) === ((1L, 2L, -2048L)))
  }

  test("meanShiftQuantized: null cohort rows count as the complement") {
    val df = Seq(
      (1L, Array(1.0f), Some(true)), (2L, Array(3.0f), Option.empty[Boolean]))
      .toDF("vec_id", "embedding", "is_a")
    val r = LinAlg.meanShiftQuantized(df, "embedding", col("is_a")).collect().head
    assert((r.getLong(1), r.getLong(2)) === ((1L, 1L)))
    assert(r.getLong(3) === 1L * 1024 - 1L * 3072)
  }
}
