package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector row filtering as a SCAN-FUSED PREDICATE
  * ([[graft.io.Versioned]]'s merge-on-read fast path): the resolved
  * per-file deleted-position sets ride the plan to the executors and each
  * row answers "am I deleted?" with a binary search — no broadcast-build
  * job, no anti-join, nothing between the parquet scan and the rest of
  * the query. This is how production lakehouse readers apply DVs (the
  * bitmap travels WITH the scan); the anti-join stays as the fallback
  * when the deleted-row count outgrows what a plan should carry. */
object DvExprs {

  /** `dv_not_deleted(rel, idx)` — true iff position `idx` of file `rel`
    * is NOT in the deletion vector. `positions` arrays must be sorted
    * ascending per file. Rows arrive file-clustered from the reader, so a
    * per-thread last-file memo makes the map lookup amortized O(1). */
  case class DvNotDeleted(left: Expression, right: Expression,
                          dv: Map[String, Array[Long]]) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (STRING, BIGINT), got (${left.dataType}, ${right.dataType})")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "dv_not_deleted"

    // last (file, positions) pair per thread — rel strings repeat in runs
    @transient private lazy val last =
      new ThreadLocal[Array[AnyRef]] { override def initialValue() = new Array[AnyRef](2) }

    def notDeleted(rel: UTF8String, idx: Long): Boolean = {
      val t = last.get()
      var arr: Array[Long] = null
      if (t(0) != null && rel.equals(t(0).asInstanceOf[UTF8String])) {
        arr = t(1).asInstanceOf[Array[Long]]
      } else {
        arr = dv.getOrElse(rel.toString, null)
        t(0) = rel.clone()
        t(1) = arr
      }
      arr == null || java.util.Arrays.binarySearch(arr, idx) < 0
    }

    override protected def nullSafeEval(rel: Any, idx: Any): Any =
      notDeleted(rel.asInstanceOf[UTF8String], idx.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dvFilter", this, classOf[DvNotDeleted].getName)
      nullSafeCodeGen(ctx, ev, (r, i) => s"${ev.value} = $ref.notDeleted($r, $i);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def dv_not_deleted(rel: Column, idx: Column, dv: Map[String, Array[Long]]): Column =
    ColumnBridge.column(DvNotDeleted(
      ColumnBridge.expression(rel), ColumnBridge.expression(idx), dv))
}
