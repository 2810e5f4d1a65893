package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BM25 against an independent scalar reference implementation (both idf
  * modes), plus the ranking-behavior properties that define BM25 (term
  * saturation, length normalization).
  */
class RetrievalSpec extends SparkSpec {

  private def tokenize(text: String): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq

  /** Scalar reference corpus stats from collected (id, text) docs. */
  private case class Ref(docs: Map[Long, Seq[String]]) {
    val withTokens: Map[Long, Seq[String]] = docs.filter(_._2.nonEmpty)
    val n: Long = withTokens.size.toLong
    val s: Long = withTokens.values.map(_.size.toLong).sum
    val df: Map[String, Long] = withTokens.values
      .flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def tf(d: Long): Map[String, Long] =
      withTokens(d).groupBy(identity).view.mapValues(_.size.toLong).toMap

    def lnScore(terms: Seq[String], d: Long, k1: Double, b: Double): (Double, Long) = {
      val dl = withTokens(d).size.toLong
      val tfd = tf(d)
      val hits = terms.distinct.filter(tfd.contains)
      val sc = hits.map { t =>
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val tfp = tfd(t) * (k1 + 1.0) /
          (tfd(t) + k1 * (1.0 - b + b * dl.toDouble * n / s))
        idf * tfp
      }.sum
      (sc, hits.size.toLong)
    }

    def rationalScore(terms: Seq[String], d: Long): (Long, Long) = {
      val dl = withTokens(d).size.toLong
      val tfd = tf(d)
      val hits = terms.distinct.filter(tfd.contains)
      val sc = hits.map { t =>
        val idf = (2 * n - 2 * df(t) + 1) * 1000000L / (2 * df(t) + 1)
        val tfp = (22 * tfd(t) * s) * 1000000L /
          (10 * tfd(t) * s + 3 * s + 9 * dl * n)
        idf * tfp / 1000000L
      }.sum
      (sc, hits.size.toLong)
    }
  }

  private lazy val corpus = Ref(Tables.documents(spark, sfDir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> tokenize(r.getString(1))).toMap)

  private lazy val queryTerms: Seq[(Long, String)] = {
    // top-8 df tokens, split into two queries by token length parity
    val top = corpus.df.toSeq.sortBy { case (t, d) => (-d, t) }.take(8)
    top.map { case (t, _) => (t.length.toLong % 2, t) }
  }

  test("LnIdf matches the scalar reference on every matched (query, doc)") {
    import spark.implicits._
    val q = queryTerms.toDF("query_id", "term")
    // k larger than the corpus: no top-k boundary, so float summation-order
    // noise cannot change membership
    val got = Retrieval.bm25TopK(Tables.documents(spark, sfDir), "doc_id", "text",
        q, "query_id", "term", k = 1000000, mode = Retrieval.LnIdf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val want = (for {
      (qid, terms) <- queryTerms.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      d <- corpus.withTokens.keys
      (sc, nt) = corpus.lnScore(terms, d, 1.2, 0.75)
      if nt > 0
    } yield (qid, d) -> (sc, nt)).toMap
    assert(got.keySet == want.keySet)
    assert(got.nonEmpty)
    got.foreach { case (k, (sc, nt)) =>
      assert(nt == want(k)._2, s"$k n_terms")
      assert(math.abs(sc - want(k)._1) <= 1e-9 * math.max(1.0, math.abs(sc)), s"$k score")
    }
  }

  test("RationalIdf is bit-exact including ranks") {
    import spark.implicits._
    val q = queryTerms.toDF("query_id", "term")
    val got = Retrieval.bm25TopK(Tables.documents(spark, sfDir), "doc_id", "text",
        q, "query_id", "term", k = 7, mode = Retrieval.RationalIdf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val want = queryTerms.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.flatMap {
      case (qid, terms) =>
        corpus.withTokens.keys.toSeq
          .map(d => (d, corpus.rationalScore(terms, d)))
          .filter(_._2._2 > 0)
          .sortBy { case (d, (sc, _)) => (-sc, d) }
          .take(7).zipWithIndex
          .map { case ((d, (sc, nt)), i) => (qid, d, sc, nt, i + 1L) }
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("saturation: higher tf wins at equal length; length norm: shorter doc wins at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana pear"),
      (2L, "apple banana banana pear"),
      (3L, "apple kiwi"),
      (4L, "apple kiwi kiwi kiwi kiwi kiwi kiwi kiwi")).toDF("doc_id", "text")
    val q = Seq((0L, "apple")).toDF("query_id", "term")
    for (mode <- Seq[Retrieval.IdfMode](Retrieval.LnIdf, Retrieval.RationalIdf)) {
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", q, "query_id", "term",
          k = 4, mode = mode)
        .orderBy("rank").select("doc_id").collect().map(_.getLong(0)).toSeq
      // hand-computed (avgdl = 4.5): tfp(d1)=4.4/3.1 > tfp(d3)=2.2/1.7 >
      // tfp(d2)=2.2/2.1 > tfp(d4)=2.2/2.9 — tf=2 beats tf=1 even at double
      // length, the short doc beats equal-tf longer docs
      assert(ranked == Seq(1L, 3L, 2L, 4L), s"$mode: got $ranked")
    }
  }
}
