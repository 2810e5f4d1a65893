package graft.text

import graft.SparkSpec
import graft.functions.UnigramExprs
import org.apache.spark.sql.functions._

/** Semantics pins for [[Unigram]]: the fixed-point log, the Viterbi DP
  * against exhaustive enumeration (the same brute force the DuckDB oracle
  * runs), the EM round, the distributed twin, and the kernel expression. */
class UnigramSpec extends SparkSpec {

  test("fixedLog2Q16: exact on powers of two, within 2^-12 of true log2 elsewhere") {
    for (e <- 0 to 52) assert(Unigram.fixedLog2Q16(1L << e) === e.toLong * 65536L)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val x = math.abs(rnd.nextLong()) % ((1L << 52) - 1) + 1
      val got = Unigram.fixedLog2Q16(x) / 65536.0
      val want = math.log(x.toDouble) / math.log(2.0)
      assert(math.abs(got - want) < 1.0 / 4096,
        s"x=$x got=$got want=$want")
    }
  }

  /** Brute force: enumerate every cut mask, score by Σ splg, order by
    * (score DESC, k ASC, mask ASC) — exactly the oracle's shape. */
  private def bruteBest(word: String, splg: java.util.HashMap[String, java.lang.Long],
                        unk: Long, maxLen: Int): Seq[String] = {
    val cp = word.codePoints().toArray
    val n = cp.length
    require(n >= 1 && n <= 20, "bruteBest: test-sized words only")
    def segOf(mask: Long): Seq[String] = {
      val cuts = (0 until n - 1).filter(i => ((mask >> i) & 1L) == 1L).map(_ + 1)
      val bounds = 0 +: cuts :+ n
      bounds.zip(bounds.tail).map { case (a, b) => new String(cp, a, b - a) }
    }
    def scoreOf(pieces: Seq[String]): Option[Long] = {
      var s = 0L
      for (p <- pieces) {
        val v = splg.get(p)
        if (v != null) s += v.longValue
        else if (p.codePointCount(0, p.length) == 1) s += unk
        else return None
        if (p.codePointCount(0, p.length) > maxLen) return None
      }
      Some(s)
    }
    val ranked = (0L until (1L << (n - 1))).flatMap { m =>
      val seg = segOf(m)
      scoreOf(seg).map(s => (s, seg.length, m, seg))
    }
    assert(ranked.nonEmpty, s"no valid segmentation for $word")
    ranked.minBy { case (s, k, m, _) => (-s, k, m) }._4
  }

  test("viterbi equals exhaustive enumeration on randomized vocab and words (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val alpha = "abcd".take(2 + rnd.nextInt(3))
      val maxLen = 2 + rnd.nextInt(3)
      // random vocab: all singles + random multis with random counts
      val m = new java.util.HashMap[String, java.lang.Long]()
      val counts = scala.collection.mutable.Map[String, Long]()
      for (c <- alpha) counts(c.toString) = 1L + rnd.nextInt(1000)
      for (_ <- 0 until 10) {
        val len = 2 + rnd.nextInt(maxLen - 1)
        val p = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
        counts(p) = 1L + rnd.nextInt(1000)
      }
      // duplicate counts on purpose sometimes, to force score ties
      if (trial % 3 == 0) {
        val ks = counts.keys.toSeq.sorted
        for (k <- ks.drop(1)) counts(k) = counts(ks.head)
      }
      val total = counts.values.sum
      val lgT = Unigram.fixedLog2Q16(total)
      for ((p, c) <- counts) m.put(p, java.lang.Long.valueOf(Unigram.fixedLog2Q16(c) - lgT))
      val unk = -lgT
      val word = Seq.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = Unigram.viterbi(word, m, unk, maxLen).toSeq
      val want = bruteBest(word, m, unk, maxLen)
      assert(got === want, s"word=$word vocab=$counts maxLen=$maxLen")
    }
  }

  test("viterbi: unknown single code points fall back to their own piece") {
    val m = new java.util.HashMap[String, java.lang.Long]()
    m.put("a", java.lang.Long.valueOf(-1L))
    val got = Unigram.viterbi("axa", m, -100L, 3)
    assert(got.toSeq === Seq("a", "x", "a"))
  }

  test("seedVocab: singles always kept, multis top-K by (weight desc, piece asc)") {
    val words = Array(("abab", 10L), ("ba", 5L))
    // substrings: a:20+5? a appears in abab at 1,3 (w 10 each) and ba at 2 (5) = 25
    val seed = Unigram.seedVocab(words, maxPieceLen = 2, maxVocab = 4).toMap
    assert(seed("a") === 25L && seed("b") === 25L)
    // multis: ab w=20, ba w=15 (pos2 in abab=10, + ba=5); top-2 slots → ab, ba
    assert(seed.size === 4 && seed("ab") === 20L && seed("ba") === 15L)
    val seed3 = Unigram.seedVocab(words, maxPieceLen = 2, maxVocab = 3).toMap
    assert(seed3.size === 3 && seed3.contains("ab") && !seed3.contains("ba"))
  }

  test("emRound: hand-checked toy recount with add-one smoothing") {
    // vocab {a:4, b:2, ab:6}, T=12; word "ab" freq 3: ['ab'] wins
    // (splg(ab) > splg(a)+splg(b)); recount: ab=1+3=4, a=1, b=1
    val model = Unigram.Model(Array("a", "b", "ab"), Array(4L, 2L, 6L))
    val out = Unigram.emRound(Array(("ab", 3L)), model)
    assert(out.pieces.toSeq === Seq("a", "b", "ab"))
    assert(out.counts.toSeq === Seq(1L, 1L, 4L))
  }

  test("emRoundDistributed is bit-identical to the driver round") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val collected = words.as[(String, Long)].collect()
    val seed = Unigram.seedVocab(collected, 4, 96)
    val m0 = Unigram.Model(seed.map(_._1), seed.map(_._2))
    val driver = Unigram.emRound(collected, m0)
    val dist = Unigram.emRoundDistributed(words, "w", "freq", m0)
    assert(driver.pieces.toSeq === dist.pieces.toSeq)
    assert(driver.counts.toSeq === dist.counts.toSeq)
  }

  test("train is deterministic and pieces stay fixed across rounds") {
    val docs = graft.Tables.documents(spark, sfDir)
    val m1 = Unigram.train(docs, "text", maxPieceLen = 4, maxVocab = 96, emRounds = 2)
    val m2 = Unigram.train(docs, "text", maxPieceLen = 4, maxVocab = 96, emRounds = 2)
    assert(m1.pieces.toSeq === m2.pieces.toSeq)
    assert(m1.counts.toSeq === m2.counts.toSeq)
    val m0 = Unigram.train(docs, "text", maxPieceLen = 4, maxVocab = 96, emRounds = 0)
    assert(m0.pieces.toSeq === m1.pieces.toSeq)
  }

  test("viterbiScore matches enumeration, with and without an excluded piece (seeded)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 150) {
      val alpha = "abc".take(2 + rnd.nextInt(2))
      val maxLen = 2 + rnd.nextInt(2)
      val m = new java.util.HashMap[String, java.lang.Long]()
      val counts = scala.collection.mutable.Map[String, Long]()
      for (c <- alpha) counts(c.toString) = 1L + rnd.nextInt(500)
      val multis = (0 until 6).map { _ =>
        val p = Seq.fill(2 + rnd.nextInt(maxLen - 1))(alpha(rnd.nextInt(alpha.length))).mkString
        counts(p) = 1L + rnd.nextInt(500); p
      }
      val total = counts.values.sum
      val lgT = Unigram.fixedLog2Q16(total)
      for ((p, c) <- counts) m.put(p, java.lang.Long.valueOf(Unigram.fixedLog2Q16(c) - lgT))
      val word = Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length))).mkString
      val cp = word.codePoints().toArray
      // brute force: best score over all masks, optionally excluding a piece
      def brute(excl: String): Long = {
        val n = cp.length
        (0L until (1L << (n - 1))).flatMap { mask =>
          val cuts = (0 until n - 1).filter(i => ((mask >> i) & 1L) == 1L).map(_ + 1)
          val bounds = 0 +: cuts :+ n
          val pieces = bounds.zip(bounds.tail).map { case (a, b) => new String(cp, a, b - a) }
          if (excl != null && pieces.contains(excl)) None
          else {
            var s = 0L; var ok = true
            for (p <- pieces) {
              val v = m.get(p)
              if (v != null && p.length <= maxLen) s += v.longValue
              else if (p.length == 1) s += -lgT
              else ok = false
            }
            if (ok) Some(s) else None
          }
        }.max
      }
      assert(Unigram.viterbiScore(cp, m, -lgT, maxLen) === brute(null), s"word=$word")
      val excl = multis(rnd.nextInt(multis.length))
      assert(Unigram.viterbiScore(cp, m, -lgT, maxLen, excl) === brute(excl),
        s"word=$word excl=$excl")
    }
  }

  test("pruneLosses: only best-path pieces probed, hand-checked toy importance") {
    // vocab {a:4, b:2, ab:6}, T=12 — "ab" best = ['ab']; without 'ab' the
    // only path is ['a','b']: loss = freq * (splg(ab) - splg(a) - splg(b))
    val model = Unigram.Model(Array("a", "b", "ab"), Array(4L, 2L, 6L))
    val lgT = Unigram.fixedLog2Q16(12L)
    val want = 3L * ((Unigram.fixedLog2Q16(6L) - lgT) -
      ((Unigram.fixedLog2Q16(4L) - lgT) + (Unigram.fixedLog2Q16(2L) - lgT)))
    val losses = Unigram.pruneLosses(Array(("ab", 3L)), model)
    assert(losses === Map("ab" -> want))
    assert(want > 0L)
  }

  test("pruneLossesDistributed is bit-identical to the driver pass; pruneTable verdicts") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val wordsDf = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val words = wordsDf.as[(String, Long)].collect()
    val model = Unigram.trainFromWords(words, 4, 96, 2)
    val driver = Unigram.pruneLosses(words, model)
    val dist = Unigram.pruneLossesDistributed(wordsDf, "w", "freq", model)
    assert(driver === dist)
    val table = Unigram.pruneTable(words, model, nPrune = 20)
    assert(table.length === model.pieces.length)
    assert(table.filter(t => t._1.length == 1).forall(_._4), "singles must survive")
    assert(table.count(t => !t._4) === 20)
    // pruned pieces are exactly the 20 lowest-importance multis
    val multiLoss = table.filter(_._1.length > 1).map(t => (t._1, t._3)).toMap
    val prunedSet = table.filter(t => !t._4).map(_._1).toSet
    val expect = multiLoss.toSeq.sortBy { case (p, l) => (l, p) }.take(20).map(_._1).toSet
    assert(prunedSet === expect)
  }

  test("unigram_segment kernel matches direct viterbi word-by-word") {
    import spark.implicits._
    val model = Unigram.Model(Array("a", "b", "c", "ab"), Array(3L, 2L, 5L, 10L))
    val df = Seq((1L, "ab c  ab"), (2L, ""), (3L, "  "), (4L, "cab")).toDF("id", "text")
    val out = df.select(col("id"), UnigramExprs.unigram_segment(col("text"), model).as("u"))
      .select(col("id"), col("u.n_pieces"), col("u.seg"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 3L, "ab c ab")))
    assert(out(1) === ((2L, 0L, "")))
    assert(out(2) === ((3L, 0L, "")))
    // "cab": splg(c)+splg(ab) vs splg(c)+splg(a)+splg(b) etc — c|ab wins
    assert(out(3) === ((4L, 2L, "c|ab")))
  }

  test("unigram_segment n_pieces comes from the segmentation, not the '|' delimiter (r10 advisor)") {
    import spark.implicits._
    // '|' is itself a (seeded single-code-point) piece: a delimiter-derived
    // count would read "a|a" -> seg "a|||a" as 5 pieces; the truth is 3.
    val model = Unigram.Model(Array("|", "a"), Array(2L, 3L))
    val df = Seq((1L, "a|a"), (2L, "|"), (3L, "a| |a")).toDF("id", "text")
    val out = df.select(col("id"), UnigramExprs.unigram_segment(col("text"), model).as("u"))
      .select(col("id"), col("u.n_pieces"), col("u.seg"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 3L, "a|||a")))
    assert(out(1) === ((2L, 1L, "|")))
    assert(out(2) === ((3L, 4L, "a|| ||a")))
  }

  // ───────────────────── soft-EM (forward-backward) ─────────────────────

  /** Brute force for the soft E-step: enumerate every cut mask, keep the
    * in-vocab ones, exact BigInt path weights ∏ q·2^(12·(len−1)), per-piece
    * Q16-floor posteriors — exactly the DuckDB oracle's shape. */
  private def bruteSoftE(word: String, q12: java.util.HashMap[String, java.lang.Long],
                         maxLen: Int): Map[String, Long] = {
    val cp = word.codePoints().toArray
    val n = cp.length
    require(n >= 1 && n <= 20, "bruteSoftE: test-sized words only")
    def segOf(mask: Long): Seq[String] = {
      val cuts = (0 until n - 1).filter(i => ((mask >> i) & 1L) == 1L).map(_ + 1)
      val bounds = 0 +: cuts :+ n
      bounds.zip(bounds.tail).map { case (a, b) => new String(cp, a, b - a) }
    }
    val paths = (0L until (1L << (n - 1))).flatMap { m =>
      val seg = segOf(m)
      val ok = seg.forall(p =>
        q12.get(p) != null && p.codePointCount(0, p.length) <= maxLen)
      if (!ok) None
      else Some((seg, seg.map(p => BigInt(q12.get(p).longValue) <<
        (12 * (p.codePointCount(0, p.length) - 1))).product))
    }
    if (paths.isEmpty) return Map.empty
    val tw = paths.map(_._2).sum
    val s = scala.collection.mutable.Map[String, BigInt]().withDefaultValue(BigInt(0))
    for ((seg, w) <- paths; p <- seg) s(p) += w
    s.map { case (p, v) => p -> ((v << 16) / tw).toLong }.toMap
  }

  test("softExpectedCountsQ16: hand-checked two-path lattice") {
    // vocab {a:1, b:1, ab:2}, T=4 → q(a)=q(b)=1+4096/4=1025, q(ab)=1+2048=2049.
    // word "ab": path [ab] weight 2049·4096; path [a,b] weight 1025².
    val model = Unigram.Model(Array("a", "b", "ab"), Array(1L, 1L, 2L))
    val q12 = Unigram.softQ12(model)
    assert(q12.get("a").longValue === 1025L && q12.get("ab").longValue === 2049L)
    val wAb = BigInt(2049) * 4096
    val wSplit = BigInt(1025) * 1025
    val tw = wAb + wSplit
    val got = Unigram.softExpectedCountsQ16("ab".codePoints().toArray, q12, 2).toMap
    assert(got("ab") === ((wAb << 16) / tw).toLong)
    assert(got("a") === ((wSplit << 16) / tw).toLong)
    assert(got("b") === got("a"))
    // and the M-step: freq 3, add-one floor 2^16
    val out = Unigram.softEmRound(Array(("ab", 3L)), model)
    assert(out.pieces.toSeq === Seq("a", "b", "ab"))
    assert(out.counts.toSeq === Seq(65536L + 3 * got("a"), 65536L + 3 * got("b"),
      65536L + 3 * got("ab")))
  }

  test("softExpectedCountsQ16: multiplicity counted — repeated piece on one path") {
    // vocab {a only}: the single path [a,a,a] must report e(a) = 3·2^16.
    val model = Unigram.Model(Array("a"), Array(5L))
    val got = Unigram.softExpectedCountsQ16("aaa".codePoints().toArray,
      Unigram.softQ12(model), 1).toMap
    assert(got === Map("a" -> 3L * 65536L))
  }

  test("softExpectedCountsQ16 equals exhaustive path enumeration (seeded)") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 200) {
      val alpha = "abcd".take(2 + rnd.nextInt(3))
      val maxLen = 2 + rnd.nextInt(3)
      val counts = scala.collection.mutable.Map[String, Long]()
      for (c <- alpha) counts(c.toString) = 1L + rnd.nextInt(1000)
      for (_ <- 0 until 10) {
        val len = 2 + rnd.nextInt(maxLen - 1)
        counts(Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString) = 1L + rnd.nextInt(1000)
      }
      val model0 = Unigram.Model(counts.keys.toArray.sorted, counts.keys.toArray.sorted.map(counts))
      val q12 = Unigram.softQ12(model0)
      val word = Seq.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = Unigram.softExpectedCountsQ16(word.codePoints().toArray, q12, maxLen).toMap
      val want = bruteSoftE(word, q12, maxLen)
      assert(got === want, s"word=$word vocab=$counts maxLen=$maxLen")
    }
  }

  test("softExpectedCountsQ16: a word with no lattice path contributes nothing") {
    // vocab lacks 'x' entirely (no unk fallback in the soft E-step —
    // matching the oracle, whose mask set for the word is empty)
    val model = Unigram.Model(Array("a"), Array(5L))
    assert(Unigram.softExpectedCountsQ16("ax".codePoints().toArray,
      Unigram.softQ12(model), 1).isEmpty)
  }

  test("softEmRoundDistributed is bit-identical to the driver round") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val collected = words.as[(String, Long)].collect()
    val seed = Unigram.seedVocab(collected, 4, 96)
    val m0 = Unigram.Model(seed.map(_._1), seed.map(_._2))
    val driver = Unigram.softEmRound(collected, m0)
    val dist = Unigram.softEmRoundDistributed(words, "w", "freq", m0)
    assert(driver.pieces.toSeq === dist.pieces.toSeq)
    assert(driver.counts.toSeq === dist.counts.toSeq)
  }

  test("softEmRoundDistributed overflows LOUDLY like the driver's addExact (r11 advisor)") {
    import spark.implicits._
    // Two rows of word "a" at freq 2^46: e(a) = 2^16 Q16, so each fe =
    // 2^62 and the piece sum is 2^63 — one past Long.MaxValue. A plain
    // Spark Long sum would wrap silently to −2^63 and the twins would
    // DIVERGE; the decimal(38,0) sum narrows via longValueExact and
    // throws, matching the driver round's addExact on the same input.
    val model = Unigram.Model(Array("a"), Array(5L))
    val words = Seq(("a", 1L << 46), ("a", 1L << 46)).toDF("w", "freq")
    assertThrows[ArithmeticException] {
      Unigram.softEmRoundDistributed(words, "w", "freq", model)
    }
    assertThrows[ArithmeticException] {
      Unigram.softEmRound(Array(("a", 1L << 46), ("a", 1L << 46)), model)
    }
  }

  test("trainSoft is deterministic; softQ12 guards its envelope") {
    val docs = graft.Tables.documents(spark, sfDir)
    val m1 = Unigram.trainSoft(docs, "text", maxPieceLen = 4, maxVocab = 96, softRounds = 2)
    val m2 = Unigram.trainSoft(docs, "text", maxPieceLen = 4, maxVocab = 96, softRounds = 2)
    assert(m1.pieces.toSeq === m2.pieces.toSeq)
    assert(m1.counts.toSeq === m2.counts.toSeq)
    assertThrows[IllegalArgumentException] {
      Unigram.softQ12(Unigram.Model(Array("a", "b"), Array(Long.MaxValue / 2, Long.MaxValue / 2)))
    }
  }
}
