package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The q281/q283 integer text features as ONE tight-loop kernel — the
  * q247/q216 lesson applied before it bites: the builtin HOF forms
  * (`array_max(transform(toks, length))`, `size(filter(toks, len > 6))`)
  * evaluate their lambdas INTERPRETED per token, which is exactly the
  * per-element cost class that made q247's first bench 276 s. One pass
  * over the raw bytes computes all six features; QualityExprsSpec pins
  * bit-equality against the builtin form (which the DuckDB oracle
  * restates), so swapping the kernel in changes no hash. */
object QualityExprs {

  /** `quality_features(text)` → struct(f1..f6 BIGINT): token count,
    * distinct-token count, char length, '.' count, max token char length,
    * count of >6-char tokens. Token = maximal non-whitespace run (the
    * TextOps.tokens / string_split_regex('\\s+') convention via
    * [[HashAlgs]]' shared span scanner); char lengths count Unicode code
    * points (UTF-8 non-continuation bytes), matching Spark `length()` and
    * DuckDB `len()`. '.' is ASCII and cannot occur inside a UTF-8
    * continuation, so the byte count IS the char count. */
  case class QualityFeatures(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = StructType(
      (1 to 6).map(i => StructField(s"f$i", LongType, nullable = false)))
    override def prettyName: String = "quality_features"

    def compute(text: UTF8String): InternalRow = {
      val bytes = text.getBytes
      val (starts, ends, nTok) = HashAlgs.tokenSpans(bytes)
      val seen = new java.util.HashSet[UTF8String](nTok * 2)
      var maxLen = 0L
      var nLong = 0L
      var i = 0
      while (i < nTok) {
        val s = starts(i)
        val e = ends(i)
        seen.add(UTF8String.fromBytes(bytes, s, e - s))
        var chars = 0
        var j = s
        while (j < e) {
          if ((bytes(j) & 0xc0) != 0x80) chars += 1
          j += 1
        }
        if (chars > maxLen) maxLen = chars.toLong
        if (chars > 6) nLong += 1
        i += 1
      }
      var dots = 0L
      var k = 0
      while (k < bytes.length) {
        if (bytes(k) == '.') dots += 1
        k += 1
      }
      new GenericInternalRow(Array[Any](nTok.toLong, seen.size.toLong,
        text.numChars().toLong, dots, maxLen, nLong))
    }

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("qualityFeatures", this, classOf[QualityFeatures].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def quality_features(text: Column): Column =
    ColumnBridge.column(QualityFeatures(ColumnBridge.expression(text)))
}
