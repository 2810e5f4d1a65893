package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Set kernels over SORTED long arrays. `size(array_intersect(a, b))`
  * builds a hash set AND materializes the intersection array per row just
  * to count it; when both sides are already sorted and distinct (the
  * adjacency-list invariant in graph.Graphs — built with
  * sort_array(collect_list) over distinct edges), a merge scan counts in
  * O(n+m) with ZERO allocation, and real codegen keeps it inside the
  * whole-stage-codegen'd join stage. */
object ArrayAlgs {

  /** |a ∩ b| for two ASC-sorted, duplicate-free long arrays. On UNsorted
    * input the result is undefined — callers own the invariant (cheaper
    * than verifying it per row; the differential spec covers the contract). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Adjacent (w1, w2) pairs of a string array as struct rows — one pass,
    * zero per-element expression dispatch. Each UTF8String is CLONED once:
    * unsafe-backed inputs point into a row/batch buffer the scan reuses,
    * and the produced array outlives the current cursor position inside a
    * Generate (explode). One small copy per token ≪ interpreted lambda
    * dispatch per token. */
  def adjacentPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: Any = if (a.isNullAt(0)) null else a.getUTF8String(0).clone()
    var i = 1
    while (i < n) {
      val cur: Any = if (a.isNullAt(i)) null else a.getUTF8String(i).clone()
      out(i - 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object ArrayExprs {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ArrayAlgs.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ArrayAlgs.sortedIntersectCount($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** `adjacent_pairs(arr)` → array<struct<w1,w2>> of the n−1 adjacent
    * element pairs (empty for n < 2) — the tight-loop twin of the KN
    * family's `transform(sequence(1, n−1), i -> struct(element_at(ts, i),
    * element_at(ts, i+1)))` (LangModelSpec pins bit-equality; HOF lambdas
    * evaluate interpreted per element). Null elements copy through like
    * element_at. */
  case class AdjacentPairs(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<STRING>, got ${child.dataType}")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("w1", StringType), StructField("w2", StringType))), containsNull = false)
    override def prettyName: String = "adjacent_pairs"
    override protected def nullSafeEval(a: Any): Any =
      ArrayAlgs.adjacentPairs(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.ArrayAlgs.adjacentPairs($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def adjacent_pairs(arr: Column): Column =
    ColumnBridge.column(AdjacentPairs(ColumnBridge.expression(arr)))
}
