package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Vector kernels for the similarity-search path. A cosine over
  * `array<float>` expressed with zip_with/aggregate lambdas costs ~3 orders
  * of magnitude more than a fused loop (interpreted lambda dispatch per
  * element); this expression runs one pass accumulating dot and both norms,
  * with real codegen so it stays inside the whole-stage-codegen'd join stage.
  * Accumulation is double, left-to-right — same value the HOF form produces
  * on well-formed input; on MISMATCHED lengths the HOF form yields NULL and
  * this kernel throws (never a silently-truncated similarity).
  */
/** Kernels at top level: Scala only emits Java-static forwarders for
  * top-level objects, and generated code calls these statically. */
object VectorAlgs {
    /** Mismatched lengths mean malformed embeddings — fail loudly (the HOF
      * zip_with form yields NULL there; a truncated dot would be a silently
      * wrong similarity). */
    @inline private def checkLen(a: ArrayData, b: ArrayData): Int = {
      val n = a.numElements()
      if (n != b.numElements())
        throw new IllegalArgumentException(
          s"vector length mismatch: $n vs ${b.numElements()} (malformed embedding)")
      n
    }

    /** cosine(a, b) with double accumulation; NaN on zero-norm input. */
    def cosine(a: ArrayData, b: ArrayData): Double = {
      val n = checkLen(a, b)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    def dot(a: ArrayData, b: ArrayData): Double = {
      val n = checkLen(a, b)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      acc
    }

    /** Σ(aᵢ−bᵢ)² over two INTEGER-QUANTIZED vectors (array<long>) — the
      * exact distance of the centroid-shard / IVF-assign path. All-integer:
      * bit-identical under any partitioning and in any engine. */
    def sqDistLong(a: ArrayData, b: ArrayData): Long = {
      val n = checkLen(a, b)
      var acc = 0L
      var i = 0
      while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
      acc
    }
}

object VectorExprs {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<FLOAT>, got ${left.dataType}, ${right.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorAlgs.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorAlgs.cosine($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<FLOAT>, got ${left.dataType}, ${right.dataType}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorAlgs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorAlgs.dot($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  case class QuantizedSqDist(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "quantized_sqdist"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorAlgs.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorAlgs.sqDistLong($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantized_sqdist(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
