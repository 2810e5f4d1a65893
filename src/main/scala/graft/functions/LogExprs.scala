package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

import graft.text.Unigram

/** Fixed-point logarithms as codegen'd column expressions.
  *
  * [[graft.text.Unigram.fixedLog2Q16]] was introduced driver-side (the
  * unigram tokenizer scores a COLLECTED vocabulary, so its logs are
  * computed once per piece on the driver and broadcast). The Kneser–Ney
  * scorer ([[graft.text.LangModel.scoreKnQ16]]) needs the same function
  * per BIGRAM FACT ROW — corpus-sized, so it must run distributed and
  * inside whole-stage codegen: 16 integer multiply/shift steps per call,
  * no floats, no allocation.
  */
object LogExprs {

  /** `flog2_q16(x)` → BIGINT: Q16 fixed-point log2 of a positive BIGINT,
    * bit-identical to [[graft.text.Unigram.fixedLog2Q16]] (the generated
    * code calls that exact function — one deterministic definition, two
    * call sites). Throws on x < 1, matching the driver-side contract. */
  case class FixedLog2Q16(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs BIGINT, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "flog2_q16"

    override protected def nullSafeEval(input: Any): Any =
      Unigram.fixedLog2Q16(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.text.Unigram$$.MODULE$$.fixedLog2Q16($c)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def flog2_q16(x: Column): Column =
    ColumnBridge.column(FixedLog2Q16(ColumnBridge.expression(x)))
}
