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

    /** round(x·2¹⁰) quantization of an array<float> — the tight-loop twin
      * of `transform(v, x -> cast(round(cast(x as double) * 1024) as
      * bigint))` (VectorExprsSpec pins bit-equality). Per element it
      * replays Spark's exact builtin chain: float → double is widening;
      * ×1024 scales the exponent (exact); Round(double, 0) is
      * `BigDecimal.valueOf(d).setScale(0, HALF_UP)` with the NaN/Inf
      * passthrough; the final double → long cast is the ANSI cast (the
      * session default since Spark 4) — NaN/Inf/out-of-range THROW, never
      * a silent 0 (SimilaritySpec pins both forms throwing). Null elements
      * stay null, like the lambda. */
    def quantize1024(a: ArrayData): ArrayData = {
      val n = a.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val d = a.getFloat(i).toDouble * 1024.0
          val r =
            if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
            else java.math.BigDecimal.valueOf(d)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
          if (java.lang.Double.isNaN(r) ||
              r < Long.MinValue.toDouble || r > Long.MaxValue.toDouble)
            throw new ArithmeticException(
              s"quantize1024: value $r cannot be cast to BIGINT (ANSI cast overflow)")
          out(i) = r.toLong
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    /** Σ q² over a quantized array<long> — the tight-loop twin of
      * `aggregate(qv, 0L, (acc, x) -> acc + x*x)`. A null element nulls
      * the whole sum, exactly like the HOF fold (null propagates through
      * +). Returns boxed so codegen can carry the null. */
    def qnormQ(a: ArrayData): java.lang.Long = {
      val n = a.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = a.getLong(i)
        acc += x * x
        i += 1
      }
      java.lang.Long.valueOf(acc)
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

  case class Quantize1024(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<FLOAT>, got ${child.dataType}")
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "quantize1024"
    override protected def nullSafeEval(a: Any): Any =
      VectorAlgs.quantize1024(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorAlgs.quantize1024($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class QnormQ(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // null element ⇒ null sum, like the HOF fold
    override def prettyName: String = "qnorm_q"
    override protected def nullSafeEval(a: Any): Any =
      VectorAlgs.qnormQ(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val boxed = ctx.freshName("qn")
      // nullSafeCodeGen lets the body re-assign ev.isNull (the standard
      // pattern for "non-null input can still yield null")
      nullSafeCodeGen(ctx, ev, a => s"""
        java.lang.Long $boxed = graft.functions.VectorAlgs.qnormQ($a);
        if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantized_sqdist(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantize1024(v: Column): Column =
    ColumnBridge.column(Quantize1024(ColumnBridge.expression(v)))

  def qnorm_q(v: Column): Column =
    ColumnBridge.column(QnormQ(ColumnBridge.expression(v)))
}
