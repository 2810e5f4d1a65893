package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd wrapper for [[RepetitionAlgs.gopherRepetitionStats]]: one
  * STRUCT of the 18 exact integer statistics the Gopher repetition rules
  * compare (Rae et al. §A1.1) — computed in a single per-document pass so
  * the 13-flag battery stays a zero-shuffle, whole-stage-codegen scan.
  */
object RepetitionExprs {

  case class GopherRepetitionStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType =
      StructType(RepetitionAlgs.fieldNames.map(f => StructField(f, LongType, nullable = false)))
    override def prettyName: String = "gopher_repetition_stats"

    override protected def nullSafeEval(input: Any): Any =
      RepetitionAlgs.gopherRepetitionStats(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.RepetitionAlgs.gopherRepetitionStats($c);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def gopher_repetition_stats(text: Column): Column =
    ColumnBridge.column(GopherRepetitionStats(ColumnBridge.expression(text)))
}
