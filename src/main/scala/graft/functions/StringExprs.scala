package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd string-metric expressions (kernels in [[StringAlgs]]). */
object StringExprs {

  /** `bounded_levenshtein(a, b, k)`: edit distance if ≤ k else -1 — the same
    * contract as Spark's 3-arg `levenshtein`, ~50× faster on short keys
    * (prefix/suffix trim + banded DP over UTF8String bytes, no per-call
    * String conversion). The bound is a plan-time constant, like the
    * `k` of minhash_signature.
    */
  case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (StringType, StringType) if k >= 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (STRING, STRING) and k >= 0, got (${left.dataType}, ${right.dataType}), k=$k")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bounded_levenshtein"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      StringAlgs.boundedLev(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringAlgs.boundedLev($a, $b, $k);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(BoundedLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))

  /** `nfc_normalize(s)`: Unicode canonical composition (UAX #15 NFC) as a
    * codegen'd expression — Spark has no normalization builtin, and a Scala
    * UDF would break whole-stage codegen in the text-cleaning hot path.
    * Kernel in [[StringAlgs.nfc]] (ASCII fast path: identity, no
    * conversion). */
  case class NfcNormalize(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $t")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(s: Any): Any =
      StringAlgs.nfc(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.StringAlgs.nfc($c)")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def nfc_normalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))

  /** `byte_alphabet(s)`: s's UTF-8 bytes through the GPT-2 byte→unicode
    * printable alphabet ([[graft.text.Bpe.byteCharTable]]) — the input
    * normalization of a byte-level tokenizer, as ONE tight-loop codegen'd
    * kernel (per-byte work in an interpreted HOF is the q247 cost class).
    * Driver twin: [[graft.text.Bpe.byteMapStr]] (spec-pinned equal). */
  case class ByteAlphabet(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got $t")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "byte_alphabet"

    def compute(s: UTF8String): UTF8String = {
      val bytes = s.getBytes
      val table = graft.text.Bpe.byteCharTable
      val out = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = table(bytes(i) & 0xff); i += 1 }
      UTF8String.fromString(new String(out))
    }

    override protected def nullSafeEval(s: Any): Any =
      compute(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("byteAlphabet", this, classOf[ByteAlphabet].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def byte_alphabet(s: Column): Column =
    ColumnBridge.column(ByteAlphabet(ColumnBridge.expression(s)))
}
