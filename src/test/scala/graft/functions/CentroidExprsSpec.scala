package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Centroid kernels: argmax/tie semantics against hand values, the NaN
  * total order (Double.compare = Spark's struct ordering, NaN greatest —
  * the contract that keeps the kernels bit-identical to the old
  * greatest(struct) trees on zero-norm inputs), PQ code/ADC layout, and
  * the shape guards.
  */
class CentroidExprsSpec extends SparkSpec {
  import spark.implicits._

  private val ux = Array(1f, 0f)
  private val uy = Array(0f, 1f)
  private val zz = Array(0f, 0f)

  private def assignAll(cents: Seq[(Long, Array[Float])], vecs: Array[Float]*): Seq[Long] =
    vecs.map(v => Tuple1(v)).toDF("v")
      .select(CentroidExprs.nearest_centroid(col("v"), cents).as("c"))
      .as[Long].collect().toSeq

  test("nearest_centroid: cosine argmax, smallest-id ties") {
    val cents = Seq(3L -> ux, 1L -> uy, 2L -> Array(1f, 1f))
    assert(assignAll(cents, Array(10f, 0f)) == Seq(3L))
    assert(assignAll(cents, Array(0f, 2f)) == Seq(1L))
    // vec at exactly 45°: cosine ties centroid 2 (1.0) vs... 2 wins outright
    assert(assignAll(cents, Array(1f, 1f)) == Seq(2L))
    // true tie: two identical centroids, distinct ids → smallest id
    assert(assignAll(Seq(7L -> ux, 4L -> ux), Array(5f, 0f)) == Seq(4L))
  }

  test("NaN orders GREATEST (the old struct ordering): zero-norm centroid wins; all-NaN → smallest id") {
    // zero-norm centroid scores NaN, which the struct ordering put ABOVE
    // every real cosine — the kernel must preserve that, not skip it
    assert(assignAll(Seq(1L -> ux, 9L -> zz), Array(3f, 0f)) == Seq(9L))
    // zero-norm INPUT: every score NaN → tie → smallest id
    assert(assignAll(Seq(5L -> ux, 2L -> uy), Array(0f, 0f)) == Seq(2L))
  }

  test("pq_codes: per-subspace L2 argmin over slices, flat adc table layout") {
    // m=2, dsub=2; book 0: codes 0,1; book 1: codes 0,1
    val books = Seq(
      Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f)),
      Seq(0L -> Array(2f, 0f), 1L -> Array(0f, 2f)))
    val df = Seq(Tuple1(Array(1f, 0f, 0f, 2f))).toDF("v")
    val codes = df.select(CentroidExprs.pq_codes(col("v"), books).as("c"))
      .as[Seq[Long]].collect().head
    assert(codes == Seq(0L, 1L))
    val tab = df.select(CentroidExprs.pq_adc_table(col("v"), books).as("t"))
      .as[Seq[Double]].collect().head
    // (mi, entry) order: dot(q0,[1,0])=1, dot(q0,[0,1])=0, dot(q1,[2,0])=0, dot(q1,[0,2])=4
    assert(tab == Seq(1.0, 0.0, 0.0, 4.0))
  }

  test("length-mismatch inputs fail loudly (malformed embedding)") {
    val cents = Seq(1L -> ux)
    val ex = intercept[Exception] {
      Seq(Tuple1(Array(1f, 2f, 3f))).toDF("v")
        .select(CentroidExprs.nearest_centroid(col("v"), cents)).collect()
    }
    assert(ex.getMessage != null)
  }
}
