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
}
