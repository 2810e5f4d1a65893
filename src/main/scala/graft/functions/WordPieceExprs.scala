package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.WordPiece

/** WordPiece segmentation as a ZERO-SHUFFLE projection, the same
  * model-rides-the-plan shape as [[UnigramExprs]]: the learned vocabulary
  * (kilobytes) ships inside the expression, each document is segmented in
  * place — a scan, no join, no shuffle at 100 TB. Per-task word→pieces
  * memo capped at 2^16 entries (Heaps-bounded hit rate, no eviction
  * churn). */
object WordPieceExprs {

  /** `wordpiece_segment(text)` → struct(n_pieces, n_unk, seg): every
    * whitespace word greedily longest-match segmented; un-coverable words
    * collapse to one `[UNK]` and count in n_unk. Pieces joined by '|'
    * inside a word, words by ' ' — seg pins the exact segmentation in the
    * result hash. */
  case class WordPieceSegmentText(child: Expression, vocab: Seq[String])
      extends UnaryExpression {
    require(vocab.nonEmpty, "wordpiece_segment: empty vocabulary")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = StructType(Seq(
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false),
      StructField("seg", StringType, nullable = false)))
    override def prettyName: String = "wordpiece_segment"

    @transient private lazy val vocabSet = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    @transient private lazy val maxPieceChars =
      vocab.iterator.map(p =>
        if (p.startsWith("##")) p.length - 2 else p.length).max
    @transient private lazy val memo =
      new ThreadLocal[java.util.HashMap[String, (Int, String)]] {
        override def initialValue() = new java.util.HashMap[String, (Int, String)]()
      }

    /** (piece count, '|'-joined pieces) — the count comes from the
      * segmentation itself, not from counting '|' in the joined string
      * (a '|'-containing word would inflate a delimiter-derived count). */
    private def segWord(w: String): (Int, String) = {
      val m = memo.get()
      val hit = m.get(w)
      if (hit != null) return hit
      val pieces = WordPiece.segment(w, vocabSet, maxPieceChars)
      val s = (pieces.length, String.join("|", pieces: _*))
      if (m.size < (1 << 16)) m.put(w, s)
      s
    }

    /** Called from both eval and generated code. */
    def segmentStruct(text: UTF8String): InternalRow = {
      val words = text.toString.split("\\s+")
      val sb = new java.lang.StringBuilder()
      var nPieces = 0L
      var nUnk = 0L
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
          if (n == 1 && s == WordPiece.Unk) nUnk += 1L
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](nPieces, nUnk, UTF8String.fromString(sb.toString)))
    }

    override protected def nullSafeEval(input: Any): Any =
      segmentStruct(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wordpieceSeg", this, classOf[WordPieceSegmentText].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentStruct($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def wordpiece_segment(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceSegmentText(ColumnBridge.expression(text), vocab))
}
