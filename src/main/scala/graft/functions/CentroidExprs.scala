package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Centroid-set kernels for the IVF/PQ family. These replace the unrolled
  * `greatest(struct(score, -id), ...)` argmax trees (one codegen'd
  * cosine/dot node per centroid against a literal vector) — at
  * nlist = 4096 that was a ~10⁴-node projection whose generated code took
  * seconds to Janino-compile and allocated a struct per centroid per row.
  * Each kernel holds the centroid matrix as a referenced object and loops
  * in plain Java: tiny generated code, zero per-row allocation, and the
  * SAME arithmetic as [[VectorAlgs]] (ascending-index double
  * accumulation), so assignments are bit-identical to the old trees.
  * Tie-break matches `greatest(struct(s, -id))`: equal score → smallest
  * id. Comparison goes through java.lang.Double.compare, which orders
  * NaN GREATEST and equal to itself — the same total order Spark's
  * struct comparison gave the old trees, so even zero-norm inputs
  * (NaN cosine) assign identically.
  */
object CentroidExprs {

  private def checkFloatArray(prettyName: String, t: DataType): TypeCheckResult = t match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<FLOAT>, got $other")
  }

  /** `nearest_centroid(vec)` → BIGINT id of the cosine-argmax centroid
    * (ties → smallest id) — the IVF cell assignment as a pure row
    * expression: no join, no shuffle, the pass stays inside the scan
    * stage. */
  case class NearestCentroidId(child: Expression, ids: Seq[Long],
                               cents: Seq[Seq[Float]]) extends UnaryExpression {
    require(ids.nonEmpty && ids.length == cents.length,
      s"nearest_centroid: ${ids.length} ids vs ${cents.length} centroids")
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArray(prettyName, child.dataType)
    override def dataType: DataType = LongType
    override def prettyName: String = "nearest_centroid"

    @transient private lazy val idArr = ids.toArray
    @transient private lazy val centArr = cents.map(_.toArray).toArray

    def assign(vec: ArrayData): Long = {
      val n = vec.numElements()
      var bestId = 0L
      var bestS = Double.NegativeInfinity
      var first = true
      var j = 0
      while (j < centArr.length) {
        val c = centArr(j)
        if (c.length != n)
          throw new IllegalArgumentException(
            s"vector length mismatch: $n vs ${c.length} (malformed embedding)")
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = vec.getFloat(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val s = dot / (math.sqrt(na) * math.sqrt(nb))
        val cmp = java.lang.Double.compare(s, bestS)
        if (first || cmp > 0 || (cmp == 0 && idArr(j) < bestId)) {
          bestS = s; bestId = idArr(j); first = false
        }
        j += 1
      }
      bestId
    }

    override protected def nullSafeEval(input: Any): Any =
      assign(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroidId].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.assign($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `pq_codes(vec)` → ARRAY<BIGINT> of m codes: per subspace mi, the id
    * of the book-mi centroid maximizing dot(sub, c) − ½‖c‖² (= L2 argmin)
    * over the vec slice [mi·dsub, (mi+1)·dsub), ties → smallest id —
    * the m per-subspace argmin trees and their slice() copies fused into
    * one pass over the vector. */
  case class PqCodes(child: Expression, ids: Seq[Seq[Long]],
                     books: Seq[Seq[Seq[Float]]]) extends UnaryExpression {
    require(books.nonEmpty && books.forall(_.nonEmpty) &&
      ids.length == books.length &&
      ids.zip(books).forall { case (a, b) => a.length == b.length },
      "pq_codes: ids/books shape mismatch")
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArray(prettyName, child.dataType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pq_codes"

    @transient private lazy val idArr = ids.map(_.toArray).toArray
    @transient private lazy val bookArr = books.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val dsub = books.head.head.length
    @transient private lazy val halfNorms: Array[Array[Double]] =
      bookArr.map(_.map(c => c.map(x => x.toDouble * x).sum / 2.0))

    def encode(vec: ArrayData): ArrayData = {
      val m = bookArr.length
      if (vec.numElements() != m * dsub)
        throw new IllegalArgumentException(
          s"vector length mismatch: ${vec.numElements()} vs ${m * dsub} (m=$m dsub=$dsub)")
      val out = new Array[Any](m)
      var mi = 0
      while (mi < m) {
        val off = mi * dsub
        val book = bookArr(mi)
        var bestId = 0L
        var bestS = Double.NegativeInfinity
        var first = true
        var j = 0
        while (j < book.length) {
          val c = book(j)
          var dot = 0.0
          var i = 0
          while (i < dsub) { dot += vec.getFloat(off + i).toDouble * c(i); i += 1 }
          val s = dot - halfNorms(mi)(j)
          val cmp = java.lang.Double.compare(s, bestS)
          if (first || cmp > 0 || (cmp == 0 && idArr(mi)(j) < bestId)) {
            bestS = s; bestId = idArr(mi)(j); first = false
          }
          j += 1
        }
        out(mi) = bestId
        mi += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `pq_adc_table(qvec)` → ARRAY<DOUBLE>, the flat asymmetric-distance
    * table in (mi, book-entry) order: entry = dot(query sub-vector mi,
    * sub-centroid) — one kernel pass instead of Σ|books| dot-of-slice
    * expression nodes. */
  case class PqAdcTable(child: Expression,
                        books: Seq[Seq[Seq[Float]]]) extends UnaryExpression {
    require(books.nonEmpty && books.forall(_.nonEmpty), "pq_adc_table: empty books")
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArray(prettyName, child.dataType)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_adc_table"

    @transient private lazy val bookArr = books.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val dsub = books.head.head.length
    @transient private lazy val total = bookArr.map(_.length).sum

    def table(vec: ArrayData): ArrayData = {
      val m = bookArr.length
      if (vec.numElements() != m * dsub)
        throw new IllegalArgumentException(
          s"vector length mismatch: ${vec.numElements()} vs ${m * dsub} (m=$m dsub=$dsub)")
      val out = new Array[Any](total)
      var o = 0
      var mi = 0
      while (mi < m) {
        val off = mi * dsub
        val book = bookArr(mi)
        var j = 0
        while (j < book.length) {
          val c = book(j)
          var dot = 0.0
          var i = 0
          while (i < dsub) { dot += vec.getFloat(off + i).toDouble * c(i); i += 1 }
          out(o) = dot
          o += 1; j += 1
        }
        mi += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      table(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.table($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def nearest_centroid(vec: Column, centroids: Seq[(Long, Array[Float])]): Column =
    ColumnBridge.column(NearestCentroidId(ColumnBridge.expression(vec),
      centroids.map(_._1), centroids.map(_._2.toSeq)))

  def pq_codes(vec: Column, books: Seq[Seq[(Long, Array[Float])]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec),
      books.map(_.map(_._1)), books.map(_.map(_._2.toSeq))))

  def pq_adc_table(vec: Column, books: Seq[Seq[(Long, Array[Float])]]): Column =
    ColumnBridge.column(PqAdcTable(ColumnBridge.expression(vec),
      books.map(_.map(_._2.toSeq))))
}
