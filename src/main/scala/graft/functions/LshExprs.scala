package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket kernel. The hyperplane matrix is derived
  * deterministically from xxhash64(table, bit, dim) — identical on every
  * executor with zero state shipped — and cached per (tables, nbits, dim)
  * shape, so the per-row cost is a pure tables×nbits×dim fused multiply-add
  * sweep (~6k flops), not 6k hash computations.
  */
object LshAlgs {
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** planes(t*nbits+b)(d) in [-1, 1]. */
  def planes(tables: Int, nbits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((tables, nbits, dim), { _ =>
      Array.tabulate(tables * nbits) { tb =>
        val t = tb / nbits; val b = tb % nbits
        Array.tabulate(dim) { d =>
          val h = XXH64.hashLong(t.toLong << 40 | b.toLong << 20 | d.toLong, 42L)
          (java.lang.Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0
        }
      }
    })

  /** One sign-bucket long per table. Null elements are rejected loudly
    * (getFloat on a null slot is undefined garbage, which would silently
    * scatter the row across wrong buckets). */
  def buckets(vec: ArrayData, tables: Int, nbits: Int): ArrayData = {
    val dim = vec.numElements()
    val p = planes(tables, nbits, dim)
    val out = new Array[Long](tables)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d))
        throw new IllegalArgumentException("hyperplane_buckets: null element in embedding array")
      v(d) = vec.getFloat(d).toDouble; d += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val plane = p(t * nbits + b)
        var proj = 0.0
        var i = 0
        while (i < dim) { proj += v(i) * plane(i); i += 1 }
        if (proj > 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

object LshExprs {

  /** array<long>: the sign bucket of `vec` in each of `tables` hash tables. */
  case class HyperplaneBuckets(child: Expression, tables: Int, nbits: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<FLOAT>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hyperplane_buckets"

    override protected def nullSafeEval(input: Any): Any =
      LshAlgs.buckets(input.asInstanceOf[ArrayData], tables, nbits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.LshAlgs.buckets($c, $tables, $nbits);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def hyperplane_buckets(vec: Column, tables: Int, nbits: Int): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(vec), tables, nbits))
}
