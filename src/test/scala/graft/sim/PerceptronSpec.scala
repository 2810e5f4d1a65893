package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for [[Perceptron]]: the batch update rule hand-checked
  * epoch by epoch (including the margin-0-counts-as-misclassified start),
  * order-freeness under repartition, and the overflow envelope. */
class PerceptronSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // (f0 = bias, f1 = x): +1 at x = 1, −1 at x = 3 — separable by sign(2 − x)
    Seq((1L, 1L, 1L), (1L, 3L, -1L)).toDF("f0", "f1", "y")
  }

  test("batch perceptron: hand-checked epochs, margin 0 updates") {
    // w0 = (0,0): both margins 0 → both update: Δ = (1,1) + (−1,−3) = (0,−2)
    // w1 = (0,−2): +1 misclassified (m = −2), −1 correct (y·m = 6) → Δ = (1,1)
    // w2 = (1,−1): +1 at margin 0 → updates again → w3 = (2,0)
    // w3 = (2,0): −1 misclassified (y·m = −2) → Δ = (−1,−3) → w4 = (1,−3)
    val cols = Seq("f0", "f1")
    assert(Perceptron.train(fixture, "y", cols, epochs = 1).toSeq === Seq(0L, -2L))
    assert(Perceptron.train(fixture, "y", cols, epochs = 2).toSeq === Seq(1L, -1L))
    assert(Perceptron.train(fixture, "y", cols, epochs = 3).toSeq === Seq(2L, 0L))
    assert(Perceptron.train(fixture, "y", cols, epochs = 4).toSeq === Seq(1L, -3L))
    // and w4 separates: score(x=1) = 1−3 = −2... the toy oscillates — the
    // CLASSIFIER guarantee is convergence on separable data over enough
    // epochs, not monotonicity; what this spec pins is the exact integer
    // trajectory the oracle replays.
  }

  test("the update is order-free: any partitioning gives identical weights") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (1L, rnd.nextInt(100).toLong, rnd.nextInt(50).toLong, if (rnd.nextBoolean()) 1L else -1L)
    }
    val df = rows.toDF("f0", "f1", "f2", "y")
    val cols = Seq("f0", "f1", "f2")
    val a = Perceptron.train(df.repartition(1), "y", cols, epochs = 5).toSeq
    val b = Perceptron.train(df.repartition(13, col("f1")), "y", cols, epochs = 5).toSeq
    assert(a === b)
  }

  test("decimal dot: huge features can't silently wrap the margin (r11 advisor)") {
    import spark.implicits._
    // Single row (f0 = 2^44, y = +1). Epoch 1: margin 0 → w = 2^44 (inside
    // the 2^46 envelope). Epoch 2's margin is w·f = 2^88 — a Long dot
    // wraps that to exactly 0 (2^88 mod 2^64) → "misclassified" → a
    // silent second update to 2^45. The DECIMAL dot computes 2^88 exactly
    // → correctly classified → no update. Pin the correct trajectory.
    val df = Seq((1L << 44, 1L)).toDF("f0", "y")
    assert(Perceptron.train(df, "y", Seq("f0"), epochs = 2).toSeq === Seq(1L << 44))
  }

  test("guards: envelope require fires on runaway weights; epoch bound") {
    import spark.implicits._
    val big = Seq((1L << 50, 1L)).toDF("f0", "y")
    val e = intercept[IllegalArgumentException] {
      Perceptron.train(big, "y", Seq("f0"), epochs = 1)
    }
    assert(e.getMessage.contains("envelope"))
    assertThrows[IllegalArgumentException] {
      Perceptron.train(fixture, "y", Seq("f0", "f1"), epochs = 65)
    }
  }
}
