package graft.dedup

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles here"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "another unrelated snippet mentioning gradient descent optimization loops")
  ).toDF("doc_id", "text")

  test("exactDupGroups finds the exact duplicate and keeps min id") {
    val groups = Dedup.exactDupGroups(docs, $"doc_id", $"text")
    assert(groups.count() === 4)
    val dup = groups.filter($"n_copies" === 2).head()
    assert(dup.getLong(2) === 0L) // keep_id
  }

  test("exactDedup keeps one representative per content") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() === 4)
    assert(out.filter($"doc_id" === 3).count() === 0)
  }

  test("jaccardPairsExact finds the near-dup pair and the exact pair") {
    val pairs = Dedup.jaccardPairsExact(docs, "doc_id", "text", thresh10 = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("minhash signature has k entries; identical docs get identical signatures") {
    val sigs = Dedup.withMinhashSignature(docs, "text", "sig", 3, 16)
      .select($"doc_id", $"sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L).length === 16)
    assert(sigs(0L) === sigs(3L))
    assert(sigs(0L) != sigs(2L))
  }

  test("minhashNearDupPairs recovers the exact-dup and near-dup pairs, not the unrelated") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", thresh10 = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L || a == 4L || b == 4L })
  }

  test("simhash: identical docs equal; near-dups within small hamming; unrelated far") {
    val fps = docs.select($"doc_id", Dedup.simhash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) === fps(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0L), fps(1L)) <= 12)
    assert(ham(fps(0L), fps(2L)) > 12)
  }

  test("simhashNearDupPairs finds exact dup at distance 0") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("prefix-filtered shingle Jaccard equals the brute-force answer (no lost pairs)") {
    import graft.functions.HashExprs._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    def brute(th: Int) = {
      val sets = corpus.select($"doc_id".as("id"),
        array_distinct(shingle_hashes($"text", 3)).as("sh"))
        .filter(size($"sh") > 0)
      val a = sets.select($"id".as("id_a"), $"sh".as("sh_a"))
      val b = sets.select($"id".as("id_b"), $"sh".as("sh_b"))
      a.join(b, $"id_a" < $"id_b")
        .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")).cast("long"))
        .withColumn("uni", (size($"sh_a") + size($"sh_b") - $"inter").cast("long"))
        .filter($"inter" * 10 >= $"uni" * th)
        .select("id_a", "id_b", "inter", "uni")
    }
    for (th <- Seq(3, 7); dfOrder <- Seq(false, true)) {
      val exact = brute(th).collect().map(_.toSeq).toSet
      val fast = Dedup.shingleJaccardPairsPrefix(corpus, "doc_id", "text", th,
          dfOrderedPrefixes = dfOrder)
        .collect().map(_.toSeq).toSet
      assert(fast === exact, s"threshold $th dfOrder $dfOrder")
    }
  }

  test("shinglesFromTokens produce n-token grams in order") {
    val sh = Seq("a b c d").toDF("t")
      .withColumn("toks", TextOps.tokens($"t"))
      .select(TextOps.shinglesFromTokens($"toks", 3).as("s")).head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
  }

  test("HOF minhashSignature is bit-identical to the codegen'd kernel (same hash family)") {
    import graft.functions.HashExprs
    val staged = docs.withColumn("sh", HashExprs.shingle_hashes($"text", 3))
    val hof = staged.select($"doc_id", Dedup.minhashSignature($"sh", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = Dedup.withMinhashSignature(docs, "text", "sig", 3, 16)
      .select($"doc_id", $"sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hof === kernel)
  }

  test("shingle_set kernel is bit-identical to the HOF form on real corpus text") {
    // order AND content: array_distinct keeps first occurrence, so must the
    // kernel's HashSet guard. Real sf0.001 documents + planted edge cases
    // (short doc, repeated shingles, mixed whitespace, empty, unicode).
    val edge = Seq(
      (9001L, "a b"), (9002L, ""), (9003L, "  \t\n  "),
      (9004L, "x y z x y z x y z"), (9005L, "one\ttwo\nthree  four five"),
      (9006L, "café naïve résumé café naïve résumé extra")
    ).toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, sfDir).select("doc_id", "text").union(edge)
    for (n <- Seq(1, 3, 5)) {
      val hof = corpus.select($"doc_id", Dedup.shingleSetHof($"text", n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val kernel = corpus.select($"doc_id", Dedup.shingleSet($"text", n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(kernel === hof, s"shingle_set(n=$n) must match the HOF pipeline exactly")
    }
  }

  test("minhash_signature rejects null elements instead of hashing garbage") {
    val ex = intercept[Exception] {
      spark.sql("SELECT 1").select(
        graft.functions.HashExprs.minhash_signature(
          array(lit(1L), lit(null).cast("long")), 4)).collect()
    }
    assert(ex.getMessage.contains("null element") ||
      Option(ex.getCause).exists(_.getMessage.contains("null element")))
  }

  test("shingle_hashes expression matches hashing the HOF shingles") {
    import graft.functions.HashExprs
    import org.apache.spark.sql.functions.{transform => hof_transform, xxhash64}
    val df = Seq("the quick brown fox jumps", "one two").toDF("t")
    val got = df.select(HashExprs.shingle_hashes($"t", 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    val exp = df.withColumn("toks", TextOps.tokens($"t"))
      .withColumn("sh", TextOps.shinglesFromTokens($"toks", 3))
      .select(hof_transform($"sh", s => xxhash64(s)).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(got.toSeq === exp.toSeq)
  }

  test("detShingleSet: distinct 3-gram strings; short docs empty, not reversed-sequence garbage") {
    val out = Seq("a b c d", "x y", "").toDF("text")
      .select(Dedup.detShingleSet($"text").as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty) // < 3 tokens: the sequence(1,0) guard
    assert(out(2) === Seq.empty)
  }

  test("det MinHash: exact dup shares all bands; near-dup found; unrelated absent") {
    val pairs = Dedup.minhashDetNearDupPairs(docs, "doc_id", "text", thresh10 = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) === 8L) // identical: all 8 bands
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dups
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("det SimHash: exact dup at distance 0; unrelated beyond maxDist") {
    val pairs = Dedup.simhashDetNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((0L, 3L)) === 0L)
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("det rolling fingerprint is order-sensitive; identical docs equal; empty doc = 0") {
    val fps = Seq(
      (0L, "alpha beta gamma"), (1L, "gamma beta alpha"), // same bag, different order
      (2L, "alpha beta gamma"), (3L, "")
    ).toDF("doc_id", "text")
      .select($"doc_id", Dedup.fingerprintRollingDet($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) === fps(2L))
    assert(fps(0L) !== fps(1L))
    assert(fps(3L) === 0L)
  }

  test("winnowing: rightmost tie-break pinned on a constant doc; guarantee + bounds") {
    // 8 identical tokens -> all 6 k-grams hash equal -> every window's min
    // ties across the whole window, so robust winnowing must select the
    // RIGHTMOST position of each window: {w, w+1, ..., m} = {4, 5, 6}
    val const = Seq((0L, "t t t t t t t t")).toDF("doc_id", "text")
    val sel = Dedup.winnowFingerprintsDet(const, "doc_id", "text")
      .collect().map(_.getLong(1)).sorted
    assert(sel.toSeq === Seq(4L, 5L, 6L))

    // substring guarantee: docs sharing >= w+k-1 = 6 consecutive tokens
    // share at least one selected fingerprint VALUE
    val docs2 = Seq(
      (1L, "p q r s t u v w x"),
      (2L, "zz yy r s t u v w qq")).toDF("doc_id", "text") // share "r s t u v w"
    val byDoc = Dedup.winnowFingerprintsDet(docs2, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)

    // density/bounds: m - w + 1 >= selections >= m / w; all pos in [1, m]
    val m = 9 - 2 // doc 1: 9 tokens -> 7 k-grams
    val pos1 = Dedup.winnowFingerprintsDet(docs2, "doc_id", "text")
      .filter($"id" === 1L).collect().map(_.getLong(1))
    assert(pos1.length <= m - 3 && pos1.length >= m / 4)
    assert(pos1.forall(p => p >= 1 && p <= m))

    // short docs (< 6 tokens) produce no fingerprints
    val short = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.winnowFingerprintsDet(short, "doc_id", "text").count() === 0L)
  }

  test("native det shingle+minhash expressions are bit-identical to the HOF string pipeline") {
    import graft.functions.HashExprs.{det_minhash_signature, det_shingle_hashes}
    val k = 32
    // hash-set equality: the native kernel skips array_distinct (inert
    // under the min fold), so compare SETS of shingle hashes
    val hofSets = docs
      .select($"doc_id", Dedup.detShingleSet($"text").as("ws"))
      .withColumn("hs", transform($"ws", w => Dedup.detTokenHash(w)))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet)
    val natSets = docs
      .select($"doc_id", det_shingle_hashes($"text", 3).as("hs"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    assert(natSets.toSeq === hofSets.toSeq)

    // end-to-end signature equality against the fully-interpreted form
    val viaExpr = docs
      .select($"doc_id", det_shingle_hashes($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
      .select($"doc_id", det_minhash_signature($"hs", k).as("sig"))
    val viaHof = docs
      .select($"doc_id", Dedup.detShingleSet($"text").as("ws"))
      .filter(size($"ws") > 0)
      .withColumn("hs", transform($"ws", w => Dedup.detTokenHash(w)))
      .select($"doc_id", transform(sequence(lit(0L), lit((k - 1).toLong)),
        i => array_min(transform($"hs", h => Dedup.detPerm(i, h)))).as("sig"))
    val a = viaExpr.orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val b = viaHof.orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(a.toSeq === b.toSeq)
  }

  test("winnow_select kernel is bit-identical to the HOF window-min form (pos AND fp)") {
    import graft.functions.HashExprs.{det_shingle_hashes, winnow_select}
    val (k, w) = (3, 4)
    // the HOF form winnowFingerprintsDet used before the kernel rewrite
    val hof = docs
      .select($"doc_id".as("id"), graft.text.TextOps.tokens($"text").as("ts"))
      .filter(size($"ts") >= k + w - 1)
      .withColumn("hs", transform(sequence(lit(1), size($"ts") - (k - 1)),
        i => Dedup.detTokenHash(concat_ws(" ",
          (0 until k).map(d => element_at($"ts", i + d)): _*))))
      .select($"id", explode(array_distinct(
        transform(sequence(lit(1), size($"hs") - (w - 1)), i => {
          val mh = array_min(slice($"hs", i, lit(w)))
          struct(
            array_max(filter(sequence(i, i + (w - 1)),
              j => element_at($"hs", j) === mh)).cast("long").as("pos"),
            mh.as("fp"))
        }))).as("sel"))
      .select($"id", $"sel.pos".as("pos"), $"sel.fp".as("fp"))
    val kernel = docs
      .select($"doc_id".as("id"), det_shingle_hashes($"text", k).as("hs"))
      .filter(size($"hs") >= w)
      .select($"id", explode(winnow_select($"hs", w)).as("sel"))
      .select($"id", $"sel.pos".as("pos"), $"sel.fp".as("fp"))
    val a = kernel.orderBy("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = hof.orderBy("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("det kernels fail loudly on bad input: out-of-domain hash, n<1 shingles, empty array null") {
    import graft.functions.HashExprs.{det_minhash_signature, det_shingle_hashes}
    // 28-bit domain is validated, not assumed (silent wrap would corrupt)
    val bad = Seq(Seq(1L << 40)).toDF("hs")
    val e = intercept[Exception] {
      bad.select(det_minhash_signature($"hs", 4)).collect()
    }
    // the 28-bit validation specifically must have fired somewhere in the
    // wrapped cause chain — any other failure mode should FAIL this test
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("28-bit")), s"cause chain: $messages")
    // n < 1 rejected at construction
    intercept[IllegalArgumentException] {
      det_shingle_hashes(lit("a b c"), 0)
    }
    // no shingles → null signature (mirrors array_min-on-empty semantics)
    val empty = Seq(Seq.empty[Long]).toDF("hs")
    assert(empty.select(det_minhash_signature($"hs", 4)).head().isNullAt(0))
  }

  test("det MinHash bands and the xxhash64 kernel path agree on planted dup clusters") {
    // same corpus through both hash families: the verified pair sets must
    // agree on the planted relations (exact + near dups), the det form
    // additionally exposing band counts the oracle checks
    val det = Dedup.minhashDetNearDupPairs(docs, "doc_id", "text", thresh10 = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Dedup.minhashNearDupPairs(docs, "doc_id", "text", thresh10 = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(det === fast)
  }

  test("containment: a quoted short doc inside a long one is found, and Jaccard misses it") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // the short doc
      // 10's full text quoted inside a much longer commentary
      (11L, "intro words here alpha beta gamma delta epsilon zeta plus a very long " +
        "tail of commentary spanning many additional tokens about unrelated things " +
        "that keep growing the containing document far beyond the quoted span"),
      (12L, "totally unrelated content mentioning shuffles joins and aggregates only")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairsExact(corpus, "doc_id", "text", thresh10 = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((10L, 11L)), "short-inside-long must be a containment pair")
    assert(!cont.contains((11L, 10L)), "containment is DIRECTED — the long doc is not inside the short one")
    assert(!cont.exists { case (a, b) => a == 12L || b == 12L })
    // the same relation is invisible to symmetric Jaccard at the same threshold
    val jac = Dedup.jaccardPairsExact(corpus, "doc_id", "text", thresh10 = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((10L, 11L)), "Jaccard must NOT see the asymmetric pair (that's the point)")
  }

  test("containment: indexed scale path reproduces the exact baseline bit-for-bit") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    for (t <- Seq(5, 8, 10)) {
      val exact = Dedup.containmentPairsExact(docs, "doc_id", "text", thresh10 = t)
        .collect().map(key).toSet
      val idx = Dedup.containmentPairsIndexed(docs, "doc_id", "text", thresh10 = t)
        .collect().map(key).toSet
      assert(idx === exact, s"thresh10=$t: prefix filtering must lose/add nothing")
    }
    // mutual near-copies appear in BOTH directions
    val both = Dedup.containmentPairsExact(docs, "doc_id", "text", thresh10 = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(both.contains((0L, 3L)) && both.contains((3L, 0L)), "exact dups contain each other")
  }

  test("containment gate: hand fixture — best ref, smallest-id tie-break, short/empty docs") {
    import spark.implicits._
    // refs (even ids): 2 and 4 are identical (tie on inter → smallest id),
    // 6 is unrelated. incoming (odd ids): 1 fully inside 2/4; 3 shares
    // nothing; 5 too short for a 3-gram (n_sh = 0); 7 half-contained.
    val docs = Seq(
      (2L, "alpha beta gamma delta epsilon"),
      (4L, "alpha beta gamma delta epsilon"),
      (6L, "zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta"),
      (3L, "mu nu xi omicron"),
      (5L, "pi rho"),
      (7L, "alpha beta gamma nu xi omicron pi")).toDF("doc_id", "text")
    val idx = Dedup.containmentIndex(docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val got = Dedup.containmentGate(docs.filter($"doc_id" % 2 === 1),
        "doc_id", "text", idx, thresh10 = 8)
      .as[(Long, Long, Option[Long], Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: shingles {a b g, b g d} both in 2 and 4 → inter 2 = n_sh, tie → ref 2
    assert(got(1L) === ((2L, Some(2L), 2L, true)))
    // doc 3: 2 shingles, none shared
    assert(got(3L) === ((2L, None, 0L, false)))
    // doc 5: too short — 0 shingles, never gated
    assert(got(5L) === ((0L, None, 0L, false)))
    // doc 7: 5 shingles, only "alpha beta gamma" in 2/4 → 1/5 < 0.8
    assert(got(7L) === ((5L, Some(2L), 1L, false)))
  }

  test("containment gate agrees with the pairs baseline on corpus text") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val inc = docs.filter($"doc_id" % 2 === 1)
    val ref = docs.filter($"doc_id" % 2 === 0)
    val idx = Dedup.containmentIndex(ref, "doc_id", "text")
    val gate = Dedup.containmentGate(inc, "doc_id", "text", idx, thresh10 = 8)
      .as[(Long, Long, Option[Long], Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // baseline: directed exact pairs from the union corpus, restricted to
    // incoming→reference direction, reduced to the per-A best
    val pairs = Dedup.containmentPairsExact(docs, "doc_id", "text", thresh10 = 1)
      .filter($"id_a" % 2 === 1 && $"id_b" % 2 === 0)
      .as[(Long, Long, Long, Long)].collect()
    val bestOf = pairs.groupBy(_._1).map { case (a, ps) =>
      val best = ps.minBy(p => (-p._3, p._2))
      a -> ((best._2, best._3, best._4))
    }
    for ((a, (refId, inter, nA)) <- bestOf) {
      val g = gate(a)
      // thresh10=1 baseline only surfaces pairs with inter*10 >= n_a, so
      // compare where the baseline sees the true best (inter >= n_a/10)
      if (g._4 * 10L >= nA) {
        assert(g._3 === Some(refId) && g._4 === inter,
          s"doc $a: gate=${g._3}/${g._4} baseline=$refId/$inter")
        assert(g._5 === (inter * 10 >= nA * 8))
      }
    }
    assert(bestOf.nonEmpty, "baseline found no incoming→reference pairs at sf0.001")
  }

  test("containmentIndex guards: corpus-scale reference refused, duplicate ids refused") {
    import spark.implicits._
    val docs = Seq((2L, "a b c d e"), (4L, "f g h i j")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.containmentIndex(docs, "doc_id", "text", maxPostings = 3)
    }
    assert(e.getMessage.contains("containmentPairsIndexed"))
    val dup = Seq((2L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Dedup.containmentIndex(dup, "doc_id", "text")
    }
  }
}
