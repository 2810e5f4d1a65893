package graft

import org.apache.spark.sql.functions._

import graft.ops.RelOps
import graft.sim.Similarity

/** Round-6 additions: k-NN label voting, per-group quota capping, and the
  * quantized JL projection — handcrafted-fixture semantics checks (the
  * sf-scale correctness rides the DuckDB oracles q208–q210).
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("knnClassify: majority vote wins; vote ties break to the smallest label") {
    val nn = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L),        // q1: labels 7, 7, 3 → 7 by count
      (2L, 104L), (2L, 105L))                    // q2: labels 9, 4 → tie → 4
      .toDF("query_id", "neighbor_id")
    val labels = Seq((101L, 7), (102L, 7), (103L, 3), (104L, 9), (105L, 4))
      .toDF("neighbor_id", "label")
    val got = Similarity.knnClassify(nn, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 7L, 2L), (2L, 4L, 1L)))
  }

  test("groupQuota: caps each group at n, deterministically under repartitioning") {
    val docs = (1L to 100L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val kept = RelOps.groupQuota(docs, "source", "doc_id", n = 7)
    val sizes = kept.groupBy("source").count().select("count").as[Long].collect()
    assert(sizes.length === 4 && sizes.forall(_ === 7L))
    // membership is a pure function of the key — partitioning can't change it
    val again = RelOps.groupQuota(docs.repartition(13), "source", "doc_id", n = 7)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
    // n >= group size keeps everything
    assert(RelOps.groupQuota(docs, "source", "doc_id", n = 1000).count() === 100L)
  }

  test("knnClassify over the pqTopK producer: the documented scale composition holds") {
    // the vote is producer-agnostic; query the PLANTED near-dup triples
    // (each triple shares a label: (vec_id div 3) % 7 + 1) with k=2, so the
    // exact top-2 are the query's triple-mates and the prediction is their
    // shared label. pqTopK recovers those mates at 0.99 recall (PqSpec), so
    // the approximate-producer vote must agree on ≥90% of queries — the
    // measured form of the "swap pqTopK in at scale" claim in q208's doc.
    // (Querying the ISOTROPIC background instead would fail by geometry:
    // coarse pruning is uninformative there — the documented PqSpec caveat.)
    import graft.tools.NearDupScale
    import graft.sim.Similarity
    val vecs = NearDupScale.planted(spark, 1200L)
      .withColumn("label", (expr("vec_id div 3") % 7 + 1).cast("int")).cache()
    val queries = vecs.withColumn("grp", expr("vec_id div 3"))
      .filter($"grp" % 10 === 0).limit(40)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec")).cache()
    val labels = vecs.select($"vec_id".as("neighbor_id"), $"label")
    def votes(nn: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.knnClassify(nn, labels)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact  = votes(Similarity.bruteForceTopK(queries, vecs.select("vec_id", "embedding"), k = 2))
    val approx = votes(Similarity.pqTopK(queries, vecs.select("vec_id", "embedding"), k = 2,
      m = 8, ksub = 32, nlist = 32, nprobe = 8, codebookIters = 1))
    assert(exact.keySet === approx.keySet)
    val agree = exact.count { case (q, l) => approx(q) == l }
    assert(agree >= (exact.size * 9) / 10,
      s"approximate-producer vote agreement $agree/${exact.size} below 90%")
  }

  test("jlProjectQuantized: closed-form matrix, exact integer projection") {
    // one-hot input isolates single matrix entries: proj(e_i)_j = 1024·R(i,j)
    val oneHot = Seq((0L, Array.tabulate(8)(i => if (i == 2) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.jlProjectQuantized(oneHot, "vec_id", "embedding", outDims = 4)
      .orderBy("dim").select("val").as[Long].collect().toSeq
    val want = (0 until 4).map { j =>
      val x = 2L * 131 + j * 37
      1024L * (x * (x + 1) % 4099 % 3 - 1)
    }
    assert(got === want)
    // the mod-4099 detour must yield non-degenerate columns (the naive
    // linear-mod-3 formula collapses every third column to the same
    // vector, and the r6-era mod 101 aliased columns j and j+101)
    val cols = (0 until 256).map(j =>
      (0 until 64).map { i =>
        val x = i.toLong * 131 + j * 37
        x * (x + 1) % 4099 % 3 - 1
      })
    assert(cols.distinct.size === 256)
    // ...and ROWS must not alias either (input-dim side of the matrix)
    val rows = (0 until 64).map(i =>
      (0 until 256).map { j =>
        val x = i.toLong * 131 + j * 37
        x * (x + 1) % 4099 % 3 - 1
      })
    assert(rows.distinct.size === 64)
    // output shape: outDims rows per input row, dims 0..outDims-1
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
    val out = Similarity.jlProjectQuantized(emb, "vec_id", "embedding", outDims = 16)
    assert(out.count() === 20L * 16)
    assert(out.groupBy("vec_id").count().select("count").as[Long].collect().forall(_ == 16L))
  }
}
