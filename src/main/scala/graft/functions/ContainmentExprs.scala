package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The CONTAINMENT GATE as a pure row expression — the streaming/online
  * form of the q254/q255 asymmetric-containment relation: an incoming
  * document is checked against a FIXED reference corpus (a decontamination
  * benchmark set, a boilerplate bank — the model-like artifact a
  * production gate ships to executors, exactly like a tokenizer
  * vocabulary), and the row carries out its best-matching reference and
  * the gate verdict. Because the reference rides the plan as a referenced
  * object, the check is a ZERO-SHUFFLE projection: stateless, so the
  * streaming drain is row-identical to batch by construction, and gating
  * 100 TB is one scan. Corpus-vs-corpus containment (reference too large
  * to broadcast) is [[graft.dedup.Dedup.containmentPairsIndexed]]'s
  * inverted-index join — the guard on the index builder points there. */
object ContainmentExprs {

  /** `containment_gate(text)` → struct(n_sh BIGINT, best_ref BIGINT?,
    * best_inter BIGINT, gated BOOLEAN): n_sh = |A| (distinct word
    * `n`-gram shingles of the incoming doc), best_ref = the reference doc
    * maximizing |A∩B| over refs sharing ≥ 1 shingle (ties → smallest ref
    * id; NULL when none), gated ⟺ n_sh > 0 ∧ 10·|A∩best| ≥ thresh10·|A| —
    * the same directed C(A,B) = |A∩B|/|A| relation as q254/q255. The
    * selection depends only on (inter, refId), never on posting order, so
    * the result is deterministic under any build or iteration order. */
  case class ContainmentGate(child: Expression, refIds: Seq[Long],
                             postings: Seq[(String, Seq[Int])],
                             n: Int, thresh10: Int) extends UnaryExpression {
    require(n >= 1 && thresh10 >= 0 && thresh10 <= 10,
      s"containment_gate: n=$n thresh10=$thresh10")
    require(postings.forall(_._2.forall(i => i >= 0 && i < refIds.length)),
      "containment_gate: posting index out of reference range")
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
    override def dataType: DataType = StructType(Seq(
      StructField("n_sh", LongType, nullable = false),
      StructField("best_ref", LongType, nullable = true),
      StructField("best_inter", LongType, nullable = false),
      StructField("gated", BooleanType, nullable = false)))
    override def prettyName: String = "containment_gate"

    @transient private lazy val ids = refIds.toArray
    @transient private lazy val index: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]](postings.length * 2)
      postings.foreach { case (sh, refs) => m.put(UTF8String.fromString(sh), refs.toArray) }
      m
    }

    /** Called from both eval and generated code. Thread-safe: per-call
      * locals only (the shared index is read-only). */
    def gate(text: UTF8String): InternalRow = {
      val sh = HashAlgs.shingleSetStrings(text, n)
      val nSh = sh.numElements()
      // hit counts over the refs this doc's shingles actually touch —
      // bounded by Σ posting lengths of its shingles, never |refs|
      val counts = new java.util.HashMap[Integer, Integer]()
      var i = 0
      while (i < nSh) {
        val post = index.get(sh.getUTF8String(i))
        if (post != null) {
          var j = 0
          while (j < post.length) {
            val k = Integer.valueOf(post(j))
            val c = counts.get(k)
            counts.put(k, if (c == null) Integer.valueOf(1) else Integer.valueOf(c.intValue + 1))
            j += 1
          }
        }
        i += 1
      }
      var bestInter = 0L
      var bestRef = -1L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val inter = e.getValue.intValue.toLong
        val rid = ids(e.getKey.intValue)
        if (inter > bestInter || (inter == bestInter && bestRef >= 0 && rid < bestRef)) {
          bestInter = inter
          bestRef = rid
        }
      }
      val gated = nSh > 0 && bestInter * 10L >= nSh.toLong * thresh10
      new GenericInternalRow(Array[Any](nSh.toLong,
        if (bestRef < 0) null else java.lang.Long.valueOf(bestRef),
        bestInter, gated))
    }

    override protected def nullSafeEval(input: Any): Any =
      gate(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("containmentGate", this, classOf[ContainmentGate].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.gate($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def containment_gate(text: Column, refIds: Seq[Long],
                       postings: Seq[(String, Seq[Int])], n: Int, thresh10: Int): Column =
    ColumnBridge.column(ContainmentGate(ColumnBridge.expression(text),
      refIds, postings, n, thresh10))
}
