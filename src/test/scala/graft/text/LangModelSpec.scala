package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity gate: hand-computed exact values on a tiny corpus,
  * a scalar-reference differential on a larger synthetic one, and the edge
  * cases (OOV → <unk>, unseen bigrams, sub-bigram docs).
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // Train: vocab(minCount=2) = {a, b}; c = a:3 b:3 c:1 x:1.
  // Mapped streams: d1 = a b a b <unk>; d2 = a b <unk>.
  // Pairs: (a,b)=3 (b,a)=1 (b,<unk>)=2; contexts: a=3 b=3; V = 3.
  private lazy val trainDocs =
    Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
  private lazy val lm = LangModel.trainBigram(trainDocs, "doc_id", "text", minCount = 2L)

  test("adjacent_pairs kernel == HOF bigram structs bit-for-bit (corpus + edges)") {
    // r13: the transform/element_at lambda evaluated interpreted per bigram;
    // the kernel must agree on the real corpus AND the edge shapes (empty,
    // single token, null elements, null array)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(TextOps.tokens(col("text")).as("ts"))
    val edges = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq[String]()),
      org.apache.spark.sql.Row(Seq("solo")),
      org.apache.spark.sql.Row(Seq("a", null, "b")),
      org.apache.spark.sql.Row(null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, true)))))
    for (df <- Seq(corpus, edges)) {
      val cmp = df.select(
        graft.functions.ArrayExprs.adjacent_pairs(col("ts")).as("k"),
        LangModel.pairStructsHof(col("ts")).as("h"))
      assert(cmp.filter(!(col("k") <=> col("h"))).count() === 0L)
    }
  }

  test("trainBigram: thresholded vocab, mapped pair and context counts") {
    assert(lm.vocab.as[String].collect().sorted.toSeq == Seq("a", "b"))
    val pairs = lm.pairs.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "<unk>") -> 2L))
    val ctx = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("a" -> 3L, "b" -> 3L))
    assert(lm.vrow.collect().head.getLong(0) == 3L)
  }

  test("scorePpm: exact long arithmetic incl. OOV and unseen-bigram terms") {
    // "a b c a" maps to a b <unk> a → (a,b): (3+1)e6/6 = 666666;
    // (b,<unk>): 3e6/6 = 500000; (<unk>,a): unseen context, 1e6/3 = 333333.
    val scored = LangModel.scorePpm(
      Seq((10L, "a b c a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    assert(scored.getLong(1) == 3L)       // n_bigrams
    assert(scored.getLong(2) == 1499999L) // score_ppm
    assert(scored.getLong(3) == 499999L)  // mean_ppm
  }

  test("scorePerplexity: geometric-mean inverse on the same doc") {
    // p = 2/3, 1/2, 1/3 → ppl = (1/9)^(-1/3) = 9^(1/3)
    val ppl = LangModel.scorePerplexity(
      Seq((10L, "a b c a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head.getDouble(2)
    assert(math.abs(ppl - math.pow(9.0, 1.0 / 3.0)) < 1e-12)
  }

  test("sub-bigram docs are unscorable and absent") {
    val out = LangModel.scorePpm(
      Seq((20L, "a"), (21L, ""), (22L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(22L))
  }

  test("perplexityGate keeps reference-like docs, drops noise") {
    val cands = Seq(
      (30L, "a b a b a b"), // in-distribution: every pair is the modal (a,b)/(b,a)
      (31L, "z q w e r t")  // all-OOV noise: every pair is unseen-(<unk>,<unk>), ppl = V = 3 exactly
    ).toDF("doc_id", "text")
    val kept = LangModel.perplexityGate(cands, "doc_id", "text", lm, maxPpl = 2.5)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(30L))
    assert(kept.columns.toSeq == Seq("doc_id", "text", "ppl"))
  }

  test("differential: scorePerplexity matches a scalar reference on random docs") {
    val rnd = new scala.util.Random(42)
    val words = Vector("a", "b", "c", "d", "e", "f", "rare1", "rare2")
    def mk(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val train = (1L to 40L).map(i => (i, mk(3 + rnd.nextInt(20)))).toDF("doc_id", "text")
    val cand = (100L to 120L).map(i => (i, mk(2 + rnd.nextInt(15))))
    val model = LangModel.trainBigram(train, "doc_id", "text", minCount = 10L)

    // scalar reference from the collected model
    val vocab = model.vocab.as[String].collect().toSet
    val pairs = model.pairs.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = model.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = model.vrow.collect().head.getLong(0)
    def map1(w: String) = if (vocab(w)) w else "<unk>"
    def refPpl(text: String): Option[Double] = {
      val ts = text.split("\\s+").filter(_.nonEmpty).map(map1)
      val bs = ts.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      if (bs.isEmpty) None
      else {
        val s = bs.map { case (w1, w2) =>
          math.log((pairs.getOrElse((w1, w2), 0L) + 1.0) / (ctx.getOrElse(w1, 0L) + v))
        }.sum
        Some(math.exp(-s / bs.size))
      }
    }

    val got = LangModel.scorePerplexity(cand.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = cand.flatMap { case (id, t) => refPpl(t).map(id -> _) }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, p) =>
      assert(math.abs(got(id) - p) < 1e-9, s"doc $id: got ${got(id)}, want $p")
    }
  }
}
