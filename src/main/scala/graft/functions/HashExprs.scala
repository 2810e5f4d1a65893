package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup hot path. These exist because
  * the equivalent higher-order-function pipelines (transform/aggregate
  * lambdas) are interpreted per element — measured ~10µs/element, which at
  * k=64 hashes × ~100 shingles × row made MinHash the bottleneck. Each
  * expression has real `doGenCode`, so it stays inside whole-stage codegen
  * and runs the [[HashAlgs]] kernel as a static call per row.
  *
  * Preference-order note (SURVEY §4): these are tier (b) — scalar custom
  * Expressions — chosen only after tier (a) (composed builtins) was measured
  * too slow; no custom LogicalPlan/Strategy is needed since the surrounding
  * join/agg shapes are all standard.
  */
object HashExprs {

  /** array<long> of xxhash64 hashes of word n-gram shingles of `text`. */
  case class ShingleHashes(child: Expression, n: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(n >= 1, s"shingle_hashes: n must be >= 1, got $n " +
      "(n <= 0 would hash nTok+1 empty shingles to one constant)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.shingleHashes(input.asInstanceOf[UTF8String], n, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashAlgs.shingleHashes($c, $n, ${seed}L);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** array<string> of DISTINCT word n-gram shingles (first-occurrence
    * order) — the exact-containment/Jaccard domain, where the hashed form
    * above can't serve (a 64-bit collision would silently corrupt an
    * |A∩B| count the family promises is exact). Replaces an interpreted
    * `array_distinct(transform(slice+array_join))` HOF pipeline.
    */
  case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle_set: n must be >= 1, got $n " +
      "(n <= 0 would emit nTok+1 empty shingles)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingle_set"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.shingleSetStrings(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashAlgs.shingleSetStrings($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature (array<long> of k minima) from shingle hashes.
    * Null on an empty shingle array.
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.minhashSignature(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
         ${ev.value} = graft.functions.HashAlgs.minhashSignature($c, $k);
         ${ev.isNull} = (${ev.value} == null);
         """)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash fingerprint of `text` (whitespace tokens). */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.simhash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashAlgs.simhash($c);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** md5-family deterministic shingle hashes
    * ([[HashAlgs.detShingleHashes]]): 28-bit md5 prefix per word n-gram —
    * the engine-portable sibling of [[ShingleHashes]], same tokenizer,
    * md5 instead of xxhash64. */
  case class DetShingleHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"det_shingle_hashes: n must be >= 1, got $n " +
      "(n <= 0 would hash nTok+1 empty shingles to one constant)")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "det_shingle_hashes"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.detShingleHashes(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashAlgs.detShingleHashes($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Deterministic affine MinHash signature (engine-portable md5 family,
    * [[HashAlgs.detMinhashSignature]]) — the codegen'd twin of the
    * Dedup.detPerm HOF pipeline: same values, one tight k·n loop instead
    * of k·n interpreted lambda evaluations. */
  case class DetMinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "det_minhash_signature"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.detMinhashSignature(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
         ${ev.value} = graft.functions.HashAlgs.detMinhashSignature($c, $k);
         ${ev.isNull} = (${ev.value} == null);
         """)

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Robust-winnowing window selection ([[HashAlgs.winnowSelect]]):
    * array<struct<pos,fp>> of deduped window minima with rightmost
    * tie-break — one O(n) deque pass vs the O(n·w) HOF form. */
  case class WinnowSelect(child: Expression, w: Int)
      extends UnaryExpression {
    require(w >= 2, s"winnow_select: window must be >= 2, got $w")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $t")
    }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "winnow_select"

    override protected def nullSafeEval(input: Any): Any =
      HashAlgs.winnowSelect(input.asInstanceOf[ArrayData], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashAlgs.winnowSelect($c, $w);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Intersection size of two ASCENDING-sorted long arrays — single merge
    * scan (O(n+m)) instead of array_intersect's per-call hash set. Used by
    * the exact similarity joins' verify step, where it runs once per
    * candidate pair.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName needs two ARRAY<BIGINT>, got $l, $r")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_size"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashAlgs.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HashAlgs.sortedIntersectSize($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---- Column API (Spark 4: Expression <-> Column goes through
  // classic.ExpressionUtils; the old `new Column(expr)` is gone) ----

  private def toCol(e: Expression): Column = ColumnBridge.column(e)
  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)

  def shingle_hashes(text: Column, n: Int): Column =
    toCol(ShingleHashes(toExpr(text), n))

  def shingle_set(text: Column, n: Int): Column =
    toCol(ShingleSet(toExpr(text), n))

  def minhash_signature(shingleHashes: Column, k: Int): Column =
    toCol(MinHashSignature(toExpr(shingleHashes), k))

  def det_minhash_signature(detHashes: Column, k: Int): Column =
    toCol(DetMinHashSignature(toExpr(detHashes), k))

  def det_shingle_hashes(text: Column, n: Int): Column =
    toCol(DetShingleHashes(toExpr(text), n))

  def winnow_select(hashes: Column, w: Int): Column =
    toCol(WinnowSelect(toExpr(hashes), w))

  def simhash64(text: Column): Column = toCol(SimHash64(toExpr(text)))

  def sorted_intersect_size(a: Column, b: Column): Column =
    toCol(SortedIntersectSize(toExpr(a), toExpr(b)))
}
