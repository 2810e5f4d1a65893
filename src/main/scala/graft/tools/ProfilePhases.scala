package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Optimization-round phase probe (guide §1.4): time individual
  * sub-expressions of the hot text-family queries with the noop sink, so the
  * kernelization work targets the real cost, not a guess. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def phase(name: String)(df: => DataFrame): Unit = {
      val built = df
      noop(built) // warm codegen once
      val t0 = System.nanoTime()
      noop(built)
      println(f"[phase] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    }

    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select("doc_id", "text", "lang", "source").localCheckpoint(true)
    println(s"[phase] docs rows = ${docs.count()}")

    // --- the c4 chain ---
    val pageHof = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"),
        (pmod(col("doc_id"), lit(8L)) + 3L).as("__k"))
      .withColumn("__nl", expr("(size(__toks) + __k - 1) div __k"))
      .withColumn("__lines", when(col("__nl") > 0L,
          transform(sequence(lit(0L), col("__nl") - 1L), i =>
            concat(
              array_join(slice(col("__toks"),
                (i * col("__k") + 1L).cast("int"), col("__k").cast("int")), " "),
              element_at(array(lit("."), lit("!"), lit(""), lit("?")),
                (pmod(i + col("doc_id"), lit(4L)) + 1L).cast("int")))))
        .otherwise(array().cast("array<string>")))
      .withColumn("__extras", filter(array(
          when(pmod(col("doc_id"), lit(13L)) === 0L,
            lit("Lorem ipsum dolor sit amet.")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17L)) === 0L,
            lit("please enable javascript to continue browsing.")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(19L)) === 0L,
            lit("body { display: none }")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7L)) === 0L,
            lit("too short here.")).otherwise(lit(""))),
        x => length(x) > 0))
      .select(col("doc_id"),
        array_join(concat(col("__lines"), col("__extras")), "\n").as("page"))

    phase("c4PageFixture (HOF)")(pageHof)
    val pages = pageHof.localCheckpoint(true)
    println(s"[phase] pages rows = ${pages.count()}")
    phase("c4Flags (HOF) over pages")(TextOps.c4Flags(pages, "page"))
    phase("c4Flags minus md5")(TextOps.c4Flags(pages, "page").drop("clean_md5"))
    phase("gopherFlags (HOF)")(TextOps.gopherFlags(docs, "text", stopWords = Seq("the", "a")))
    phase("qualityFeatures (kernel)")(graft.SparkEntry.qualityFeatures(docs))

    // --- KN / tokenizer pieces ---
    phase("tokens+explode bigrams count")(
      docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c")))
    locally {
      val isTrain = graft.ops.RelOps.hashSampleFilter(col("doc_id"), 0.8)
      val lm = graft.text.LangModel.trainKneserNey(
        docs.filter(isTrain), "doc_id", "text", minCount = 100L)
      phase("scoreKnQ16 (held-out 20%)")(
        graft.text.LangModel.scoreKnQ16(docs.filter(!isTrain), "doc_id", "text", lm))
    }
    locally {
      val merges = graft.text.Bpe.learnMerges(docs, "text", nMerges = 64)
        .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      phase("bpe applyMerges 64 over corpus")(
        docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
          .select(size(graft.text.Bpe.applyMerges(col("w"), merges)).as("n")))
      val uni = graft.text.Unigram.train(docs, "text",
        maxPieceLen = 5, maxVocab = 128, emRounds = 3)
      phase("unigram_segment over corpus")(
        docs.select(graft.functions.UnigramExprs.unigram_segment(col("text"), uni).as("u")))
      val words = graft.text.WordPiece.wordWeights(docs, "text")
      val wpVocab = graft.text.WordPiece.vocabOf(words,
        graft.text.WordPiece.trainFromWords(words, nMerges = 64))
      phase("wordpiece_segment over corpus")(
        docs.select(graft.functions.WordPieceExprs.wordpiece_segment(col("text"), wpVocab.toSeq).as("u")))
      println("[phase] timing unigram train (driver+jobs, not noop): ")
      val t0 = System.nanoTime()
      graft.text.Unigram.train(docs, "text", maxPieceLen = 5, maxVocab = 128, emRounds = 3)
      println(f"[phase] unigram train                      ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      val t1 = System.nanoTime()
      graft.text.Bpe.learnMerges(docs, "text", nMerges = 64)
      println(f"[phase] bpe learnMerges(64) driver         ${(System.nanoTime() - t1) / 1e9}%8.3fs")
      val t2 = System.nanoTime()
      val ww = graft.text.WordPiece.wordWeights(docs, "text")
      graft.text.WordPiece.trainFromWords(ww, nMerges = 64)
      println(f"[phase] wordpiece train(64)                ${(System.nanoTime() - t2) / 1e9}%8.3fs")
    }
    // --- suffix-ranks / dup-window feed (q272/q277) ---
    phase("dupWindowStats depth=8")(
      graft.dedup.SuffixRanks.dupWindowStats(docs, "doc_id", "text", depth = 8))
    spark.stop()
  }
}
