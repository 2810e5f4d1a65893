package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hilbert index: exhaustive agreement with a reference xy2d, bijectivity,
  * and the adjacency invariant that separates it from the Z-curve. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook xy2d (the same rotate-and-accumulate walk, plain ints). */
  private def refXy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbertIndex2D matches the reference on every 8x8 cell and is a bijection") {
    val bits = 3
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
    val got = ZOrder.withHilbertIndex2D(grid, col("x"), col("y"), bits, "h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case ((x, y), h) => assert(h === refXy2d(bits, x, y), s"cell ($x, $y)") }
    assert(got.values.toSet === (0L until 64L).toSet) // bijective onto [0, 64)
  }

  test("consecutive Hilbert indexes are grid-adjacent (the invariant Z-order lacks)") {
    val bits = 4
    val n = 1L << bits
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val byH = ZOrder.withHilbertIndex2D(grid, col("x"), col("y"), bits, "h")
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    (0L until n * n - 1).foreach { h =>
      val (x1, y1) = byH(h); val (x2, y2) = byH(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"jump at h=$h")
    }
    // the Z-curve breaks this on the same grid (e.g. z=1 (1,0) -> z=2 (0,1)
    // is diagonal) — which is exactly the locality argument for Hilbert
    val z1 = (1L, 0L); val z2 = (0L, 1L)
    assert(math.abs(z1._1 - z2._1) + math.abs(z1._2 - z2._2) === 2L)
  }

  test("per-bucket bounding boxes stay tile-shaped on the uniform grid") {
    // 16 equal Hilbert ranges of the 32x32 grid must each cover a tight
    // 8x8 tile (area 64 = count) — the file-skipping win in its pure form
    val bits = 5
    val n = 1L << bits
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val boxes = ZOrder.withHilbertIndex2D(grid, col("x"), col("y"), bits, "h")
      .groupBy((col("h") * 16 / lit(n * n)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        (max("x") - min("x") + 1).as("w"), (max("y") - min("y") + 1).as("hgt"))
      .collect()
    assert(boxes.length === 16)
    boxes.foreach { r =>
      assert(r.getLong(1) === 64L)
      assert(r.getLong(2) * r.getLong(3) === 64L, s"bucket ${r.getLong(0)} box not tight")
    }
  }
}
