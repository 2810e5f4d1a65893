package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Unigram

/** Corpus-scale unigram-LM tokenization ([[graft.text.Unigram]]) as a
  * ZERO-SHUFFLE projection: the trained model rides the plan (a tokenizer
  * vocabulary is kilobytes-to-megabytes — the same artifact every
  * production Spark tokenization job ships to executors) and each
  * document is segmented in place — no join against a segmentation
  * table, no per-word shuffle, nothing but a scan at 100 TB.
  *
  * Per-task word→segmentation memo: Viterbi runs once per DISTINCT word a
  * task sees (Heaps-bounded), capped at 2^16 entries — beyond the cap new
  * words are segmented without caching (no eviction churn, no growth).
  */
object UnigramExprs {

  /** `unigram_segment(text)` → struct(n_pieces BIGINT, seg STRING): every
    * whitespace word Viterbi-segmented under the model; pieces joined by
    * '|' inside a word, words by ' ' — so `seg` pins the full
    * segmentation in the result hash and n_pieces is the token count a
    * budget/packing stage consumes. */
  case class UnigramSegmentText(child: Expression, pieces: Seq[String],
                                counts: Seq[Long]) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = StructType(Seq(
      StructField("n_pieces", LongType, nullable = false),
      StructField("seg", StringType, nullable = false)))
    override def prettyName: String = "unigram_segment"

    @transient private lazy val model = Unigram.Model(pieces.toArray, counts.toArray)
    @transient private lazy val splg = model.splgMap
    @transient private lazy val unk = model.unkSplg
    @transient private lazy val maxLen = model.maxPieceLen
    @transient private lazy val memo =
      new ThreadLocal[java.util.HashMap[String, (Int, String)]] {
        override def initialValue() = new java.util.HashMap[String, (Int, String)]()
      }

    /** (piece count, '|'-joined pieces). The count comes from the
      * segmentation itself, NOT from counting '|' in the joined string —
      * a corpus word that CONTAINS '|' (a seeded single-code-point piece)
      * would otherwise inflate the count. */
    private def segWord(w: String): (Int, String) = {
      val m = memo.get()
      val hit = m.get(w)
      if (hit != null) return hit
      val pieces = Unigram.viterbi(w, splg, unk, maxLen)
      val s = (pieces.length, String.join("|", pieces: _*))
      if (m.size < (1 << 16)) m.put(w, s)
      s
    }

    /** Called from both eval and generated code. */
    def segmentStruct(text: UTF8String): InternalRow = {
      val words = text.toString.split("\\s+")
      val sb = new java.lang.StringBuilder()
      var nPieces = 0L
      var first = true
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (w.nonEmpty) {
          val (n, s) = segWord(w)
          if (!first) sb.append(' ')
          sb.append(s)
          first = false
          nPieces += n
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](nPieces, UTF8String.fromString(sb.toString)))
    }

    override protected def nullSafeEval(input: Any): Any =
      segmentStruct(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramSeg", this, classOf[UnigramSegmentText].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentStruct($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def unigram_segment(text: Column, model: Unigram.Model): Column =
    ColumnBridge.column(UnigramSegmentText(ColumnBridge.expression(text),
      model.pieces.toSeq, model.counts.toSeq))
}
