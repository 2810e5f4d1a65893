package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ: index-shape invariants, an exhaustive-regime exactness check
  * (full probing + all-covering shortlist ⇒ identical to brute force, so
  * the whole encode/ADC/re-rank plumbing is pinned), and the measured
  * recall bound in the pruning regime.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "embedding")

  test("trainPqCodebooks: m codebooks of ksub dsub-wide centroids; dim must divide") {
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8, iters = 1)
    assert(cb.m == 4 && cb.ksub == 8 && cb.dsub == 16)
    assert(cb.books.size == 4)
    cb.books.foreach { b =>
      assert(b.size == 8)
      assert(b.map(_._1).sorted == (0L until 8L))
      b.foreach { case (_, v) => assert(v.length == 16) }
    }
    val err = intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 5, ksub = 8, iters = 0)
    }
    assert(err.getMessage.contains("not divisible"))
  }

  test("pqEncode: compressed index has in-range codes and the true norm") {
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8, iters = 0)
    val coarse = Seq(0L -> Array.fill(64)(0.1f), 1L -> Array.fill(64)(-0.1f))
    val idx = Similarity.pqEncode(emb, "vec_id", "embedding", coarse, cb)
    assert(idx.columns.toSeq == Seq("vec_id", "cell", "codes", "norm"))
    assert(idx.count() == emb.count())
    val bad = idx.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 8) ||
      col("cell") < 0 || col("cell") > 1).count()
    assert(bad == 0L)
    // stored norm equals an independently computed one
    val normErr = idx.join(emb, "vec_id")
      .select(abs(col("norm") - sqrt(Similarity.dot(col("embedding"), col("embedding")))))
      .as[Double].collect().max
    assert(normErr < 1e-9)
  }

  test("exhaustive regime: full probing + all-covering shortlist == brute force") {
    val queries = emb.limit(15)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // nprobe=nlist and k·refineFactor ≥ |corpus| ⇒ ADC pruning is a no-op
    // and the exact re-rank sees every candidate: output must be identical
    val pq = Similarity.pqTopK(queries, emb, k = 3,
        m = 4, ksub = 8, nlist = 8, nprobe = 8, codebookIters = 0, refineFactor = 200)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, emb, 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq === brute)
  }

  test("pruning regime: planted-corpus recall of the true neighbors stays high") {
    // every 10th id-triple of the planted corpus is a near-dup cluster
    // (pairwise cosine ≈ 0.99 against an isotropic background): a dup
    // vector's true top-2 are its triple-mates, and near-identical vectors
    // land in the same coarse cell, so probing must recover them even at
    // nprobe << nlist. This measures the REAL pruning path — on the
    // isotropic sf embeddings coarse pruning is uninformative by geometry
    // (any nprobe/nlist fraction keeps that fraction of the corpus).
    import graft.tools.NearDupScale
    val vecs = NearDupScale.planted(spark, 3000L).cache()
    val queries = vecs.withColumn("grp", expr("vec_id div 3"))
      .filter($"grp" % 10 === 0).limit(60)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec")).cache()
    val truth = NearDupScale.plantedPairs(vecs)
      .select(explode(array(
        struct($"id_a".as("query_id"), $"id_b".as("neighbor_id")),
        struct($"id_b".as("query_id"), $"id_a".as("neighbor_id")))).as("p"))
      .select("p.*").join(queries.select("query_id"), Seq("query_id"))
      .as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(queries, vecs, k = 2,
        m = 8, ksub = 32, nlist = 32, nprobe = 8, codebookIters = 1,
        refineFactor = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq & truth).size.toDouble / truth.size
    info(f"IVF-PQ planted recall@2 = $recall%.3f (nprobe=8/32, refine=10, m=8, ksub=32)")
    assert(recall >= 0.9, f"recall $recall%.3f below the planted-structure bar")
    // per-query row budget respected
    val counts = Similarity.pqTopK(queries, vecs, k = 2,
        m = 4, ksub = 16, nlist = 32, nprobe = 8, codebookIters = 0)
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(counts.forall(_ <= 2))
  }
}
