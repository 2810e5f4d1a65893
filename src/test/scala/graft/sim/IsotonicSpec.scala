package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for [[Isotonic]]: hand-checked PAV merges, equivalence
  * with the minimax closed form the oracle uses (brute-forced here), the
  * non-decreasing output property, and the loud guards. */
class IsotonicSpec extends AnyFunSuite {

  /** Brute-force minimax: ŷ(g) = max_{j≤g} min_{k≥g} mean(j..k), with the
    * same ⌊p·2³²/n⌋ key + >>16 floor the DuckDB oracle computes. */
  private def minimaxQ16(groups: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val n = groups.length
    groups.indices.map { g =>
      val best = (0 to g).map { j =>
        (g until n).map { k =>
          val p = groups.slice(j, k + 1).map(_._2).sum
          val c = groups.slice(j, k + 1).map(_._3).sum
          (p << 32) / c
        }.min
      }.max
      (groups(g)._1, best >> 16)
    }
  }

  test("hand-checked merges: violation pools, monotone input unchanged") {
    // single violation: means 1, 0 → pooled to 1/2 for both
    assert(Isotonic.pavQ16(Seq((0L, 1L, 1L), (1L, 0L, 1L))) ===
      Seq((0L, 32768L), (1L, 32768L)))
    // already isotonic: untouched
    assert(Isotonic.pavQ16(Seq((0L, 0L, 2L), (5L, 1L, 2L), (9L, 2L, 2L))) ===
      Seq((0L, 0L), (5L, 32768L), (9L, 65536L)))
    // middle dip pools left: 1, 0, 1 → (1/2, 1/2, 1)
    assert(Isotonic.pavQ16(Seq((1L, 1L, 1L), (2L, 0L, 1L), (3L, 1L, 1L))) ===
      Seq((1L, 32768L), (2L, 32768L), (3L, 65536L)))
    // cascade: 1, 1, 0 each n=1 → pooling the tail forces a full merge
    assert(Isotonic.pavQ16(Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 0L, 1L))) ===
      Seq((1L, 43690L), (2L, 43690L), (3L, 43690L))) // 2/3 in Q16
  }

  test("PAV equals the minimax closed form (seeded random)") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      var sc = 0L
      val groups = (1 to 1 + rnd.nextInt(25)).map { _ =>
        sc += 1 + rnd.nextInt(9)
        val n = 1L + rnd.nextInt(12)
        (sc, rnd.nextLong(n + 1), n)
      }
      val pav = Isotonic.pavQ16(groups)
      assert(pav === minimaxQ16(groups), s"groups=$groups")
      assert(pav.map(_._2) === pav.map(_._2).sorted, "calibrated values must be non-decreasing")
    }
  }

  test("guards: unsorted scores, bad counts, and the 2^16 envelope are loud") {
    assertThrows[IllegalArgumentException] {
      Isotonic.pavQ16(Seq((5L, 1L, 1L), (1L, 0L, 1L)))
    }
    assertThrows[IllegalArgumentException] {
      Isotonic.pavQ16(Seq((1L, 3L, 2L)))
    }
    assertThrows[IllegalArgumentException] {
      Isotonic.pavQ16(Seq((1L, 0L, 1L << 16)))
    }
    assertThrows[IllegalArgumentException] { Isotonic.pavQ16(Nil) }
  }
}
