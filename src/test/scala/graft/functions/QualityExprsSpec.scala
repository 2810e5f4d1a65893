package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-equality pin for the [[QualityExprs.QualityFeatures]] kernel
  * against the builtin-HOF feature form (which is what the q281/q283
  * DuckDB oracle restates): swapping the kernel into qualityFeatures must
  * change no value, hence no hash. */
class QualityExprsSpec extends SparkSpec {

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val cols = Seq("doc_id", "f0", "f1", "f2", "f3", "f4", "f5", "f6")
    val k = graft.SparkEntry.qualityFeatures(df)
      .select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.head.toString)
    val h = graft.SparkEntry.qualityFeaturesHof(df)
      .select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.head.toString)
    (k, h)
  }

  test("kernel is bit-identical to the builtin HOF form on real corpus text") {
    val docs = graft.Tables.documents(spark, sfDir)
    val (k, h) = both(docs)
    assert(k.length === h.length && k.nonEmpty)
    k.zip(h).foreach { case (a, b) => assert(a === b) }
  }

  test("kernel edge cases: empty, whitespace-only, unicode, dots, long tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),
      (2L, "   "),
      (3L, "a.b.c. ..."),
      (4L, "héllo wörld héllo"),            // multi-byte chars, a repeat
      (5L, "sevenlong excessive t again t"), // >6-char tokens, repeats
      (6L, "ééééééé") // 7 chars, 14 bytes
    ).toDF("doc_id", "text")
    val (k, h) = both(docs)
    k.zip(h).foreach { case (a, b) => assert(a === b) }
    // and the hand math for the unicode row: 7-char token counts as long
    val m = k.map(r => r.head -> r).toMap
    assert(m(6L) === Seq(6L, 1L, 1L, 1L, 7L, 0L, 7L, 1L))
    assert(m(1L) === Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
  }
}
