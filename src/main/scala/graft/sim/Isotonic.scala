package graft.sim

/** ISOTONIC CALIBRATION — the classic model-calibration step (Zadrozny &
  * Elkan, KDD 2002: map a classifier's raw scores to probabilities by
  * isotonic regression), done in EXACT INTEGER arithmetic so a DuckDB
  * oracle can restate it:
  *
  *  - the fit is pool-adjacent-violators (PAV) over per-score groups
  *    (score asc; group means compared by CROSS-MULTIPLICATION, never a
  *    float), whose unique solution equals the minimax closed form
  *    ŷ(g) = max_{j≤g} min_{k≥g} mean(y over groups j..k) — which is what
  *    the oracle computes, so the two share no algorithm shape;
  *  - calibrated outputs are Q16 fixed-point: q = ⌊pos·2¹⁶ / n⌋ per final
  *    block. The oracle's rational order statistic uses the key
  *    ⌊pos·2³² / n⌋, which discriminates any two rationals with
  *    denominators < 2¹⁶ exactly and satisfies key >> 16 = q (floor-
  *    division composition), so both sides floor the SAME rational.
  *
  * 100 TB shape: calibration runs on the LABELED slice (bounded — the
  * same slice the distilled classifier trains on); applying it to a
  * corpus is a broadcast step-function lookup, zero shuffle.
  */
object Isotonic {

  /** PAV over (score, pos, n) groups — MUST be sorted by score ascending,
    * scores distinct, 0 ≤ pos ≤ n, n ≥ 1, Σn < 2¹⁶ (the oracle key's
    * exactness envelope; loud require). Returns (score, q16) per group. */
  def pavQ16(groups: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    require(groups.nonEmpty, "pavQ16: empty calibration set")
    val totalN = groups.map(_._3).sum
    require(totalN < (1L << 16),
      s"pavQ16: $totalN calibration rows exceeds the 2^16 exact-key envelope — " +
        "subsample the labeled slice")
    var prev = Long.MinValue
    for ((s, p, n) <- groups) {
      require(s > prev, s"pavQ16: scores must be strictly ascending at $s")
      require(n >= 1 && p >= 0 && p <= n, s"pavQ16: bad group ($s, $p, $n)")
      prev = s
    }
    // stack of blocks (pos, n, firstGroupIdx)
    val pos = new Array[Long](groups.length)
    val cnt = new Array[Long](groups.length)
    val from = new Array[Int](groups.length)
    var top = -1
    var i = 0
    while (i < groups.length) {
      top += 1
      pos(top) = groups(i)._2; cnt(top) = groups(i)._3; from(top) = i
      // merge while the previous block's mean EXCEEDS this one's
      // (isotonic = non-decreasing): p1/n1 > p2/n2 ⟺ p1·n2 > p2·n1
      while (top >= 1 && pos(top - 1) * cnt(top) > pos(top) * cnt(top - 1)) {
        pos(top - 1) += pos(top); cnt(top - 1) += cnt(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[(Long, Long)](groups.length)
    var b = 0
    while (b <= top) {
      val until = if (b == top) groups.length else from(b + 1)
      val q = (pos(b) << 16) / cnt(b)
      var g = from(b)
      while (g < until) { out(g) = (groups(g)._1, q); g += 1 }
      b += 1
    }
    out.toSeq
  }
}
