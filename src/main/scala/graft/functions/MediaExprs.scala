package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Per-row media kernels as codegen'd expressions — decode + hash stay
  * inside the scan's WholeStageCodegen span, and (unlike an RDD
  * mapPartitions) the operator is a plain projection, so it runs on
  * STREAMING DataFrames too (q290's gate is exactly the batch plan under
  * an AvailableNow trigger). */
object MediaExprs {

  /** `spectral_hashes(bytes)` → struct(phash, dhash) for decodable images
    * ≥ 32×32 (PPM/PNG/GIF/JPEG by magic bytes), NULL otherwise — the
    * column form of [[graft.multimodal.Multimodal.spectralHashes]]'s
    * per-image work. */
  case class SpectralHashes(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs BINARY, got $t")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("phash", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "spectral_hashes"

    def compute(bytes: Array[Byte]): InternalRow =
      graft.multimodal.Multimodal.spectralHashPair(bytes) match {
        case null => null
        case (p, d) => new GenericInternalRow(Array[Any](p, d))
      }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null else compute(v.asInstanceOf[Array[Byte]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("spectralHashes", this, classOf[SpectralHashes].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = $ref.compute($c);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def spectral_hashes(bytes: Column): Column =
    ColumnBridge.column(SpectralHashes(ColumnBridge.expression(bytes)))
}
