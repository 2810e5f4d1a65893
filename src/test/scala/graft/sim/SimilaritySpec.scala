package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("codegen cosine matches the HOF reference bit-for-bit on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val pairs = a.join(b, $"id_a" < $"id_b").limit(2000)
    val diff = pairs.select(
      (Similarity.cosine($"va", $"vb") - Similarity.cosineHof($"va", $"vb")).as("d"))
      .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.abs($"d"))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("quantized_sqdist kernel matches the zip_with/aggregate HOF form exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1024) as bigint))").as("qv"))
    val a = emb.select($"vec_id".as("id_a"), $"qv".as("qa"))
    val b = emb.select($"vec_id".as("id_b"), $"qv".as("qb"))
    val pairs = a.join(b, $"id_a" < $"id_b").limit(2000)
    val mismatches = pairs.select(
      graft.functions.VectorExprs.quantized_sqdist($"qa", $"qb").as("k"),
      expr("aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("h"))
      .filter($"k" =!= $"h").count()
    assert(mismatches === 0L)
  }

  test("quantize1024/qnorm kernels match the HOF forms bit-for-bit (corpus + adversarial)") {
    // r13: the transform/aggregate lambdas evaluated INTERPRETED per
    // element; the kernels replay Spark's exact builtin chain (widening
    // cast, exact ×2¹⁰, BigDecimal HALF_UP round, truncating long cast;
    // null element ⇒ null sum) — pinned here over the real corpus PLUS the
    // adversarial values: rounding ties (±0.5/1024), negatives, NaN, ±Inf,
    // null elements, empty and null arrays.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").select($"embedding")
    val advRows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq[java.lang.Float](0.00048828125f, -0.00048828125f, 1.5f / 1024f, -1.5f / 1024f)),
      org.apache.spark.sql.Row(Seq[java.lang.Float](-0.0f, 123.456f, -2.5f / 1024f, 0.49951172f)),
      org.apache.spark.sql.Row(Seq[java.lang.Float](1.0f, null, 2.0f, 3.0f)),
      org.apache.spark.sql.Row(Seq.empty[java.lang.Float]),
      org.apache.spark.sql.Row(null))
    val adv = spark.createDataFrame(advRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true)))))
    for (df <- Seq(emb, adv)) {
      val q = df.select(
        Similarity.quantize1024($"embedding").as("k"),
        Similarity.quantize1024Hof($"embedding").as("h"))
      assert(q.filter(!($"k" <=> $"h")).count() === 0L)
      val nrm = q.select(
        Similarity.qnorm($"k").as("nk"), Similarity.qnormHof($"h").as("nh"))
      assert(nrm.filter(!($"nk" <=> $"nh")).count() === 0L)
    }
    // NaN/Inf: the ANSI double→long cast throws in the HOF form — the
    // kernel must throw too, never silently quantize to 0
    val bad = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq[java.lang.Float](Float.NaN))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true)))))
    intercept[Exception](bad.select(Similarity.quantize1024Hof($"embedding")).collect())
    intercept[Exception](bad.select(Similarity.quantize1024($"embedding")).collect())
  }

  test("centroidShardQuantized: every vector sharded once, to its geometric centroid") {
    // centroids = ids 0..2 (k smallest). 10/11 plant near centroid 1's axis,
    // 12 near centroid 2's; ties impossible by construction
    val corpus = Seq(
      (0L, Array(8.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 8.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 8.0f)),
      (10L, Array(0.1f, 7.9f, 0.0f)),
      (11L, Array(0.0f, 8.2f, 0.1f)),
      (12L, Array(0.2f, 0.0f, 7.7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.centroidShardQuantized(corpus, "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.values.map(_._1).sum === 6L)       // every vector assigned exactly once
    assert(out(0L) === ((1L, 0L, 0L, 0L)))        // centroid 0: only itself, sqdist 0
    assert(out(1L)._1 === 3L && out(1L)._4 === 11L) // 1, 10, 11
    assert(out(2L)._1 === 2L && out(2L)._3 === 2L && out(2L)._4 === 12L)
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f), Array(-1f, -2f, -3f), Array(3f, 0f, 0f), Array(0f, 4f, 0f)))
      .toDF("a", "b", "c", "x", "y")
    val row = df.select(
      Similarity.cosine($"a", $"b"), Similarity.cosine($"a", $"c"), Similarity.cosine($"x", $"y")).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) + 1.0) < 1e-12)
    assert(math.abs(row.getDouble(2)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with deterministic tiebreak") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("query_id", "query_vec")
    val out = Similarity.bruteForceTopK(queries, vecs, 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out === Seq((1L, 1), (2L, 2)))
  }

  test("lshBucketTopK candidates are a subset ranked by exact cosine; identical vec found") {
    val queries = Seq((100L, Array(0.9f, 0.1f, 0.0f))).toDF("query_id", "query_vec")
    val out = Similarity.lshBucketTopK(queries, vecs, 2, tables = 8, nbits = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.contains(1L)) // identical direction must share a bucket in some table
  }

  test("ivfTopK: exact within probed cells; finds the nearest vector when its cell is probed") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(20)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // probe ALL cells -> IVF must equal brute force exactly
    val ivfAll = Similarity.ivfTopK(queries, emb.select("vec_id", "embedding"),
        k = 3, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, emb.select("vec_id", "embedding"), 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivfAll === brute)
    // partial probing returns a subset ranking with <= k rows per query
    val ivf = Similarity.ivfTopK(queries, emb.select("vec_id", "embedding"),
      k = 3, nlist = 8, nprobe = 2)
    import org.apache.spark.sql.functions.{count => cnt, max => mx}
    assert(ivf.groupBy("query_id").agg(cnt($"rank")).collect().forall(_.getLong(1) <= 3))
  }

  test("ivfTopK with k-means-refined centroids: still exact when probing all cells") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.limit(10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val refined = Similarity.ivfTopK(queries, emb.select("vec_id", "embedding"),
        k = 3, nlist = 8, nprobe = 8, centroidIters = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, emb.select("vec_id", "embedding"), 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(refined === brute)
  }

  test("kmeansCentroids is deterministic and keeps nlist centroids") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val init = emb.limit(4).collect().toSeq.map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val a = Similarity.kmeansCentroids(emb.select($"embedding"), "embedding", init, 2)
    val b = Similarity.kmeansCentroids(emb.select($"embedding"), "embedding", init, 2)
    assert(a.size === 4)
    assert(a.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(a.map(_._2.toSeq) === b.map(_._2.toSeq))
    // refinement moved at least one centroid off its seed
    assert(a.map(_._2.toSeq) != init.map(_._2.toSeq))
  }

  test("SQL surface: registered functions are callable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(text) AS fp,
                minhash_signature(shingle_hashes(text, 3), 8) AS sig
         FROM docs_sql""").collect()
    assert(viaSql.length === 10)
    val viaCol = spark.table("docs_sql")
      .select($"doc_id", graft.functions.HashExprs.simhash64($"text").as("fp")).collect()
    assert(viaSql.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      viaCol.map(r => r.getLong(0) -> r.getLong(1)).toMap)
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(1)
      .createOrReplaceTempView("emb_sql")
    assert(math.abs(spark.sql("SELECT cosine_sim(embedding, embedding) AS c FROM emb_sql")
      .head().getDouble(0) - 1.0) < 1e-12)
    // nfc_normalize from SQL: decomposed e + combining acute composes
    assert(spark.sql("SELECT nfc_normalize('e\u0301') AS s").head().getString(0) === "\u00e9")
  }

  test("spark.sql.extensions entry point injects the custom functions into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // same SparkContext, new session built through the extensions hook —
      // exactly what spark.sql.extensions=graft.functions.GraftSparkExtensions does
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftSparkExtensions()(_))
        .getOrCreate()
      val fp = s2.sql("SELECT simhash64('the quick brown fox') AS fp").head().getLong(0)
      val direct = spark.range(1)
        .select(graft.functions.HashExprs.simhash64(lit("the quick brown fox"))).head().getLong(0)
      assert(fp === direct)
      assert(s2.sql("SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,9L)) AS n")
        .head().getLong(0) === 2L)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("cosine/dot reject mismatched vector lengths (HOF form yields NULL there)") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val ex = intercept[Exception] { df.select(Similarity.cosine($"a", $"b")).collect() }
    def hasMsg(t: Throwable): Boolean =
      t != null && (t.getMessage != null && t.getMessage.contains("length mismatch") || hasMsg(t.getCause))
    assert(hasMsg(ex))
    assert(df.select(Similarity.cosineHof($"a", $"b")).head().isNullAt(0))
  }

  test("cosineNearDupPairs finds only the close pair at a high threshold") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("planBanding: sparse plan in the production regime, None in the isotropic regime") {
    // τ=0.85, n=6000 → log-scaled nbits, affordable tables, sparse candidates
    val plan = Similarity.planBanding(6000, 0.85)
    assert(plan.nonEmpty, "production regime must plan a banding")
    val (t, b) = plan.get
    assert(b >= 12 && t <= 256, s"(t=$t, b=$b)")
    assert(1.0 - math.pow(1.0 - math.pow(2.0, -b), t.toDouble) <= 0.05,
      s"random-pair density must be sparse at (t=$t, b=$b)")
    // a billion-vector near-dup corpus at τ=0.92 still plans
    assert(Similarity.planBanding(1000000000L, 0.92).nonEmpty)
    // isotropic regime: τ=0.45 (p ≈ 0.65 — too close to random) at ANY n:
    // every banding either needs unaffordable tables or floods the join
    for (n <- Seq(4L, 500L, 5000L, 50000L, 5000000L))
      assert(Similarity.planBanding(n, 0.45).isEmpty, s"n=$n must be infeasible")
  }

  test("cosineAllPairsBlocked is bit-identical to the brute theta join across many blocks") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val blocked = Similarity.cosineAllPairsBlocked(emb, "vec_id", "embedding", 0.3, rowsPerBlock = 8)
      .as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked === brute) // Double equality included — cosJvm mirrors the codegen kernel
  }

  test("topKBlocked is bit-identical to bruteForceTopK, tie-breaks included") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val blocked = Similarity.topKBlocked(q, emb, 5, rowsPerBlock = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(blocked === brute)
  }

  test("auto mode (tables=nbits=0) on the isotropic fixture routes to the exact fallback") {
    val auto = Similarity.cosineNearDupPairsBanded(vecs, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto === brute)
  }

  test("production regime (τ=0.85): banded near-dup on a PLANTED corpus — high recall, sparse candidates") {
    import graft.tools.NearDupScale
    val n = 6000L
    val vecs = NearDupScale.planted(spark, n).cache()
    val truth = NearDupScale.plantedPairs(vecs)
      .filter(col("cos_sim") >= 0.85).select("id_a", "id_b").cache()
    val truthCount = truth.count()
    assert(truthCount > 300, s"planted structure must exist, got $truthCount pairs")
    val nbits = NearDupScale.nbitsFor(n) // log2-scaled: buckets grow with the corpus
    val banded = Similarity.cosineNearDupPairsBanded(
      vecs, "vec_id", "embedding", 0.85, tables = 48, nbits = nbits).cache()
    // recall vs the known planted truth (no O(n^2) pass needed)
    val hit = banded.join(truth, Seq("id_a", "id_b"), "left_semi").count()
    assert(hit.toDouble / truthCount >= 0.95,
      s"recall ${hit.toDouble / truthCount} below the production-regime bar")
    // precision is 1 by construction (exact verify) — every pair is real
    assert(banded.filter(col("cos_sim") < 0.85).count() === 0)
    // and the candidate volume is SPARSE, the sub-quadratic datum: the
    // isotropic corpus at τ=0.45 sits at ~90% density; planted structure
    // at τ=0.85 must stay under 2% of all pairs
    val b = vecs.select(col("vec_id").as("id"),
      posexplode(Similarity.lshBuckets(col("embedding"), 48, nbits)).as(Seq("t", "bkt")))
    val cands = b.as("l").join(b.as("r"),
        col("l.t") === col("r.t") && col("l.bkt") === col("r.bkt") &&
          col("l.id") < col("r.id"))
      .select(col("l.id"), col("r.id")).distinct().count()
    val allPairs = n * (n - 1) / 2
    assert(cands.toDouble / allPairs < 0.02,
      s"candidate density ${cands.toDouble / allPairs} not sub-quadratic-sparse")
    // AUTO mode on the same corpus: planBanding picks the banding (not the
    // fallback — the regime is separable) and recall holds without anyone
    // hand-tuning (tables, nbits). This is the r7 auto-sizing contract.
    val autoBanded = Similarity.cosineNearDupPairsBanded(vecs, "vec_id", "embedding", 0.85).cache()
    val autoHit = autoBanded.join(truth, Seq("id_a", "id_b"), "left_semi").count()
    assert(autoHit.toDouble / truthCount >= 0.95,
      s"auto-banding recall ${autoHit.toDouble / truthCount} below the bar")
    assert(autoBanded.filter(col("cos_sim") < 0.85).count() === 0)
    vecs.unpersist(); truth.unpersist(); banded.unpersist(); autoBanded.unpersist()
  }

  test("kmeansQuantized: blobs converge to blob partitions; empty clusters keep their centroid") {
    import spark.implicits._
    // two well-separated blobs: ids 0-9 near (1, 0, ...), ids 10-19 near
    // (-1, 0, ...) — but SEEDS are ids 0 and 1 (both in blob A), so only
    // ITERATING can move centroid 1 across to blob B: iters=0 must split
    // blob A between the two seeds, iters=2 must recover the blob partition
    val vecs = ((0 until 10).map(i => (i.toLong, Seq(1.0f + i * 0.001f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong, Seq(-1.0f - i * 0.001f, 0.0f))))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.kmeansQuantized(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sizes = r2.map { case (c, r) => c -> r.getLong(1) }
    assert(sizes.values.toSeq.sorted === Seq(10L, 10L),
      s"expected the blob partition after 2 Lloyd rounds, got $sizes")
    // each cluster's members are one contiguous blob (min/max id ranges)
    val ranges = r2.values.map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(ranges === Set((0L, 9L), (10L, 19L)))
    // iters=0 is the seed assignment: both seeds in blob A, so the nearest-
    // centroid split cannot match the blob structure
    // seed geometry: id0 at 1.0, id1 at 1.001 — blob A's tail joins seed 1,
    // ALL of blob B is nearer seed 0 than seed 1, so the split is 11/9
    val r0 = Similarity.kmeansQuantized(vecs, "vec_id", "embedding", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0.values.toSeq.sorted === Seq(9L, 11L), s"iters=0 seed split, got $r0")

    // identical seed vectors: ties send every row to the smaller cluster,
    // the other cluster goes EMPTY and must keep its (seed) centroid
    val dup = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val rd = Similarity.kmeansQuantized(dup, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rd(0L).getLong(1) === 3L && rd(1L).getLong(1) === 0L)
    assert(rd(1L).isNullAt(3) && rd(1L).isNullAt(4)) // no members: null min/max
    assert(rd(1L).getLong(5) === 2048L) // kept centroid = quantized seed (1024+1024)
  }

  test("mmrRerankQuantized matches a driver-side reference; diversity beats redundancy") {
    import spark.implicits._
    // reference: the same integer MMR (quantize, sign·cos²·1024 scores,
    // greedy argmax with min-id tie-break) in plain Scala
    def q1024(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1024))
    def rel(a: Seq[Long], b: Seq[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      val u = dot * dot * 1024L / (na * nb)
      if (dot >= 0) u else -u
    }
    def refMmr(queries: Seq[(Long, Seq[Float])], corpus: Seq[(Long, Seq[Float])],
               c: Int, k: Int): Set[(Long, Long, Long, Long)] = {
      val cq = corpus.map { case (i, v) => (i, q1024(v)) }
        .filter(_._2.exists(_ != 0L))
      queries.map { case (qi, qv) => (qi, q1024(qv)) }
        .filter(_._2.exists(_ != 0L))
        .flatMap { case (qi, qv) =>
          val cands = cq.filter(_._1 != qi)
            .map { case (ci, cv) => (ci, cv, rel(cv, qv)) }
            .sortBy { case (ci, _, r) => (-r, ci) }.take(c)
          var remaining = cands.map { case (ci, cv, r) => (ci, cv, r, 0L) }
          (1 to k).flatMap { s =>
            if (remaining.isEmpty) Seq.empty
            else {
              val (si, sv, sr, sm) = remaining.minBy { case (ci, _, r, m) => (-(r - m), ci) }
              remaining = remaining.filter(_._1 != si)
                .map { case (ci, cv, r, m) => (ci, cv, r, math.max(m, rel(cv, sv))) }
              Seq((qi, s.toLong, si, sr - sm))
            }
          }
        }.toSet
    }
    val corpus = Seq(
      0L -> Seq(1.0f, 0.0f, 0.2f), 1L -> Seq(0.99f, 0.02f, 0.21f),
      2L -> Seq(0.0f, 1.0f, -0.3f), 3L -> Seq(-0.4f, 0.5f, 0.6f),
      4L -> Seq(0.3f, 0.3f, 0.3f), 5L -> Seq(0.7f, -0.6f, 0.1f),
      6L -> Seq(0.0f, 0.0f, 0.0f), // zero vector: dropped on both sides
      7L -> Seq(-0.9f, -0.1f, 0.0f), 8L -> Seq(0.45f, 0.85f, 0.2f))
    val queries = Seq(0L -> corpus.toMap.apply(0L), 2L -> corpus.toMap.apply(2L))
    val got = Similarity.mmrRerankQuantized(
        queries.toDF("vec_id", "embedding"), corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", "vec_id", "embedding", c = 6, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === refMmr(queries, corpus, c = 6, k = 4))

    // the headline semantic: with one highly-relevant near-duplicate pair
    // (10, 11) and one near-orthogonal doc (12), rank 2 must be the
    // DIVERSE document, not the redundant twin — plain relevance order
    // would put 11 second
    val qv2 = Seq(100L -> Seq(0.9f, -0.1f))
    val cv2 = Seq(10L -> Seq(1.0f, 0.0f), 11L -> Seq(0.999f, 0.01f),
      12L -> Seq(0.1f, 1.0f))
    val got2 = Similarity.mmrRerankQuantized(
        qv2.toDF("vec_id", "embedding"), cv2.toDF("vec_id", "embedding"),
        "vec_id", "embedding", "vec_id", "embedding", c = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got2 === refMmr(qv2, cv2, c = 3, k = 2))
    val ranks = got2.map(t => t._2 -> t._3).toMap
    assert(ranks(1L) === 10L) // most relevant first
    assert(ranks(2L) === 12L) // diversity: the near-orthogonal doc, not id 11
  }

  test("det ANN twins: self at rank 1; ivfDet(nprobe=nlist) equals the exact integer top-k") {
    import spark.implicits._
    // deterministic pseudo-random fixture (closed-form, no RNG)
    val corpus = (0L until 30L).map(i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 13).toFloat - 6.0f) / 7.0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 7 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

    // driver-side exact integer top-k reference (the q221 score function)
    def q1024(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1024))
    def rel(a: Seq[Long], b: Seq[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      val u = dot * dot * 1024L / (na * nb)
      if (dot >= 0) u else -u
    }
    val cvecs = (0L until 30L).map(i =>
      i -> q1024((0 until 8).map(j => (((i * 31 + j * 17) % 13).toFloat - 6.0f) / 7.0f))).toMap
    val expected = cvecs.keys.filter(_ % 7 == 0).flatMap { qi =>
      cvecs.toSeq.map { case (ci, cv) => (ci, rel(cv, cvecs(qi))) }
        .sortBy { case (ci, r) => (-r, ci) }.take(5).zipWithIndex
        .map { case ((ci, r), idx) => (qi, ci, (idx + 1).toLong, r) }
    }.toSet

    // IVF with every cell probed = exact search, bit for bit
    val ivfAll = Similarity.ivfDetTopK(queries, corpus, k = 5,
        nlist = 4, iters = 1, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ivfAll === expected)

    // nprobe=1 still finds an IDENTICAL vector at rank 1 (score 1024; the
    // fixture repeats with period 13, so the smallest-id twin wins the
    // tie, e.g. query 14's rank-1 is vector 1) — its own cell is by
    // definition the nearest centroid's cell
    val ivf1 = Similarity.ivfDetTopK(queries, corpus, k = 5,
        nlist = 4, iters = 1, nprobe = 1)
      .filter($"rank" === 1).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    assert(ivf1.forall { case (q, (n, score)) => score == 1024L && n % 13 == q % 13 })

    // LSH det twin: an identical vector shares every bucket -> rank 1 at
    // score 1024 (smallest-id twin on ties); ranks contiguous from 1 with
    // non-increasing scores
    val lsh = Similarity.lshDetTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = lsh.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (qi, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._4 === 1024L && sorted.head._2 % 13 === qi % 13,
        s"no identical twin at rank 1 for $qi: $sorted")
      assert(sorted.map(_._3).toSeq === (1L to sorted.length).toSeq)
      val scores = sorted.map(_._4).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse)) // non-increasing
    }
  }

  test("pqDetTopK: exhaustive regime (m=1, ksub=n, iters=0) equals exact integer L2 top-k") {
    import spark.implicits._
    val n = 20
    val corpus = (0L until n.toLong).map(i =>
      (i, (0 until 8).map(j => (((i * 29 + j * 23) % 11).toFloat - 5.0f) / 6.0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 5 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // ksub = n, iters = 0, m = 1: every vector is (a twin of) a centroid,
    // codes index exact vectors, ADC = exact L2 — the PqSpec identity
    // argument in deterministic form
    def q1024(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1024))
    val cv = (0L until n.toLong).map(i =>
      i -> q1024((0 until 8).map(j => (((i * 29 + j * 23) % 11).toFloat - 5.0f) / 6.0f))).toMap
    // duplicate vectors (period 11) share a code: ADC score is exact L2
    // regardless, so compare (qid, score-ranked multiset) not raw ids
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expScores = cv.keys.filter(_ % 5 == 0).map { qi =>
      qi -> cv.toSeq.map { case (ci, v) => l2(v, cv(qi)) }.sorted.take(5)
    }.toMap
    val got = Similarity.pqDetTopK(queries, corpus, k = 5, m = 1, ksub = n, iters = 0)
      .collect().groupBy(_.getLong(0))
      .map { case (qi, rows) => qi -> rows.map(_.getLong(3)).sorted.toSeq }
    assert(got === expScores)

    // m=4 compressed regime: deterministic (two runs identical), ranks
    // contiguous, scores non-decreasing
    val r1 = Similarity.pqDetTopK(queries, corpus, k = 5, m = 4, ksub = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val r2 = Similarity.pqDetTopK(queries, corpus, k = 5, m = 4, ksub = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(r1 === r2 && r1.nonEmpty)
    r1.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to sorted.length).toSeq)
      assert(sorted.map(_._4) === sorted.map(_._4).sorted)
    }
  }

  test("semDedupQuantized: within-shard dup groups collapse to min-id; dot>0 guard; hand-checked") {
    import spark.implicits._
    // seeds: id0 = (1,0) / id1 = (0,1). Shard A gets {0,2,3,5} (id5 at
    // (.5,.5) TIES between centroids -> smaller centroid id wins), shard B
    // gets {1,4,6} (id6 = (-1,0) is geometrically CLOSER to (0,1) than to
    // (1,0)). In A: ids 0/2/3 are near-identical and id5 has cos .707 ≥
    // .45 to all -> ONE group, kept {0}. In B: 1-4 are identical (kept 1),
    // id6 has dot ≤ 0 to both -> the dot>0 guard keeps it a singleton.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.999f, 0.0f)), (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.5f, 0.5f)),
      (6L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semDedupQuantized(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((0L, 4L, 1L, 0L), (1L, 3L, 2L, 7L)))

    // keepFarthest (the paper's rule): shard A's group keeps id5 — the
    // member farthest from centroid (1024,0) — instead of min-id 0; shard
    // B's {1,4} are both AT the centroid (cd 0), tie -> min id 1; {6} kept
    val far = Similarity.semDedupQuantized(vecs, "vec_id", "embedding", k = 2,
        keepFarthest = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(far === Set((0L, 4L, 1L, 5L), (1L, 3L, 2L, 7L)))
  }

  test("splitLeakageAudit counts and digests cross-split near-dup pairs") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // ids 10/11 near-identical (cos ≈ 1), id 12 orthogonal; 10 → train,
    // 11 → test, 12 → train: the only pair (10, 11) crosses the split
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.99f, 0.01f)),
      (12L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val splits = corpus.select(col("vec_id"),
      when(col("vec_id") === 11L, lit("test")).otherwise(lit("train")).as("split"))
    val out = Similarity.splitLeakageAudit(corpus, "vec_id", "embedding",
        splits, "vec_id", "split", k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("test", "train", 1L, 21L)))
  }
}
