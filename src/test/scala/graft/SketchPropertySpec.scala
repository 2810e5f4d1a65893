package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.SpaceSaving

/** ScalaCheck properties for the pure aggregation kernels — the invariants
  * the distributed guarantees rest on, exercised over arbitrary streams,
  * capacities, and partition/merge shapes (no Spark session needed: the
  * Aggregator's zero/reduce/merge ARE the distributed semantics).
  */
class SketchPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val streamGen: Gen[List[Long]] =
    Gen.sized(_ => Gen.listOfN(400, Gen.chooseNum(0L, 60L)))

  test("SpaceSaving: intervals contain truth for ANY stream, capacity, chunking, merge order") {
    val prop = Prop.forAll(streamGen, Gen.choose(1, 48), Gen.choose(1, 7), Gen.choose(0L, 1L << 30)) {
      (xs: List[Long], cap: Int, nChunks: Int, seed: Long) =>
        val agg = SpaceSaving(cap)
        val rnd = new scala.util.Random(seed)
        // random chunking = arbitrary partition boundaries
        val chunks = xs.grouped(math.max(1, xs.size / nChunks)).toList
        val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
        // random merge tree = arbitrary reducer combining order
        var bufs = rnd.shuffle(partials)
        while (bufs.size > 1) {
          val i = rnd.nextInt(bufs.size - 1)
          bufs = bufs.patch(i, Seq(agg.merge(bufs(i), bufs(i + 1))), 2)
        }
        val out = agg.finish(bufs.headOption.getOrElse(agg.zero))
        val exact = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        val n = xs.size.toLong
        val sizeOk = out.size <= cap
        val boundsOk = out.forall { case (k, hi, lo) => lo <= exact(k) && exact(k) <= hi }
        val tracked = out.map(_._1).toSet
        val hhOk = exact.forall { case (k, c) => c <= n / cap || tracked(k) }
        sizeOk && boundsOk && hhOk
    }
    check("spacesaving-invariants", prop)
  }

  test("SpaceSaving: capacity >= distinct keys is EXACT regardless of chunking") {
    val prop = Prop.forAll(streamGen, Gen.choose(2, 9)) { (xs: List[Long], nChunks: Int) =>
      val agg = SpaceSaving(64) // generator draws from <= 61 distinct values
      val partials = xs.grouped(math.max(1, xs.size / nChunks)).toList
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
      val out = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      val exact = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      out.size == exact.size && out.forall { case (k, hi, lo) => hi == exact(k) && lo == exact(k) }
    }
    check("spacesaving-exact-regime", prop)
  }

  test("sortedIntersectCount == set-intersection size on arbitrary sorted distinct arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arrGen = Gen.listOf(Gen.chooseNum(-100L, 100L)).map(_.distinct.sorted)
    val prop = Prop.forAll(arrGen, arrGen) { (a: List[Long], b: List[Long]) =>
      val fast = graft.functions.ArrayAlgs.sortedIntersectCount(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      fast == (a.toSet intersect b.toSet).size.toLong
    }
    check("sorted-intersect-count", prop)
  }
}
