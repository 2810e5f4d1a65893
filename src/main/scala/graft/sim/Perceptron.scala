package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTILLED QUALITY CLASSIFIER — the FineWeb-edu pattern (Penedo et al.
  * 2024, public arXiv 2406.17557): an expensive teacher gate labels a
  * training slice, a cheap linear model distills it, and the model scores
  * the whole corpus as a projection. The trainer is the deterministic
  * integer BATCH perceptron (Rosenblatt's rule summed per epoch instead
  * of applied per row): per epoch
  *
  *   w ← w + Σ_{(x,y): y·⟨w,x⟩ ≤ 0} y·x
  *
  * — the update is an order-free INTEGER sum over the misclassified set
  * (margin 0 counts as misclassified, so the all-zero start updates on
  * every row), which is what makes the distributed form exact: sequential
  * SGD depends on row order and can never be hash-pinned; the batch rule
  * is one map-side-combined aggregation per epoch, identical on any
  * partitioning. All arithmetic is Long with loud overflow (addExact /
  * envelope require), so a DuckDB oracle replays training epoch by epoch
  * in BIGINT, bit for bit.
  *
  * 100 TB shape: training runs `epochs` aggregations over the (bounded)
  * labeled slice — each a partial-agg scan producing ONE row of feature
  * sums; only the weight vector (a few Longs) ever reaches the driver.
  * Scoring is a ZERO-SHUFFLE projection with literal weights — the
  * classifier gates a corpus at scan speed, like the C4/Gopher batteries
  * it distills.
  */
object Perceptron {

  /** ⟨w, x⟩ as a column over integer feature columns with literal
    * weights. Computed in DECIMAL(38,0): Spark's non-ANSI Long arithmetic
    * wraps silently, and feature magnitudes are caller-controlled — with
    * |w| < 2⁴⁶ (the train envelope) a 38-digit decimal holds any dot over
    * Long-valued features (2⁴⁶·2⁶³·64 ≈ 4·10³⁴ < 10³⁸), so an overflow
    * is structurally impossible rather than silently wrong. */
  def dot(featCols: Seq[String], w: Seq[Long]): Column = {
    require(featCols.nonEmpty && featCols.length == w.length,
      s"Perceptron.dot: ${featCols.length} features vs ${w.length} weights")
    require(featCols.length <= 64, s"Perceptron.dot: ${featCols.length} features exceeds 64")
    featCols.zip(w).map { case (f, wi) =>
      col(f).cast("decimal(38,0)") * lit(wi) }.reduce(_ + _)
  }

  /** Train `epochs` batch-perceptron rounds from w = 0 over `labeled`
    * (integer feature columns + a ±1 label column). All executor-side
    * arithmetic — the misclassification dot AND the epoch feature sums —
    * runs in DECIMAL(38,0) (Spark Longs wrap silently in non-ANSI mode),
    * and the sums narrow to Long via BigDecimal.longValueExact, so any
    * overflow is a loud ArithmeticException, never a silent wrap. The
    * per-epoch |w| < 2⁴⁶ envelope then bounds the next epoch's decimal
    * dot far inside 38 digits for ANY Long-valued features. */
  def train(labeled: DataFrame, yCol: String, featCols: Seq[String],
            epochs: Int): Array[Long] = {
    require(epochs >= 0 && epochs <= 64, s"Perceptron.train: epochs=$epochs")
    var w = Array.fill(featCols.length)(0L)
    var e = 0
    while (e < epochs) {
      val mis = dot(featCols, w.toSeq) * col(yCol) <= 0
      val upd = labeled
        .select(featCols.map(f =>
          sum(when(mis, col(yCol) * col(f).cast("decimal(38,0)"))
            .otherwise(lit(java.math.BigDecimal.ZERO))).as(f)): _*)
        .collect()(0)
      var i = 0
      while (i < w.length) {
        val di = if (upd.isNullAt(i)) 0L
                 else upd.getDecimal(i).toBigIntegerExact.longValueExact()
        w(i) = Math.addExact(w(i), di)
        require(math.abs(w(i)) < (1L << 46),
          s"Perceptron.train: |w($i)| = ${w(i)} exceeds the 2^46 envelope — scale features down")
        i += 1
      }
      e += 1
    }
    w
  }
}
