package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook reference trainer (Sennrich et al., Algorithm 1): vocab as
    * symbol sequences, weighted pair counts, (count desc, pair asc) argmax,
    * leftmost-greedy merge applied to every word. Driver-side, obviously
    * correct — the differential anchor for the distributed trainer. */
  private def referenceMerges(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, s"$l $r") }
        out += ((s"$l $r", l + r, c))
        vocab = vocab.map { case (syms, w) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2 // leftmost-greedy, skip the merged pair
            } else { b += syms(i); i += 1 }
          }
          (b.result(), w)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("learnMerges matches the textbook trainer on a fixture with ties, runs and adjacency") {
    // crafted stress: repeated chars (aaaa -> overlapping-pair runs),
    // count ties (broken by pair order), merges that chain (e->es->est)
    val docs = Seq.fill(5)("lowest lowest newest") ++ Seq.fill(4)("lower newer") ++
      Seq("aaaa aaaa baaa", "wide wide ride")
    val df = docs.toDF("text")
    val words = docs.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val exp = referenceMerges(words, 8).zipWithIndex
      .map { case ((p, m, c), i) => ((i + 1).toLong, p, m, c) }
    val got = Bpe.learnMerges(df, "text", nMerges = 8)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === exp)
  }

  test("byte-level: alphabet is injective and published-range-exact; kernel == driver map") {
    // the GPT-2 table's structure: printable bytes keep their code point,
    // the 68 others land contiguously at 256+i in byte order
    assert(Bpe.byteCharTable.toSeq.distinct.size === 256, "byte alphabet must be injective")
    assert(Bpe.byteCharTable('a'.toInt) === 'a' && Bpe.byteCharTable(33) === '!')
    assert(Bpe.byteCharTable(0) === 256.toChar && Bpe.byteCharTable(32) === (256 + 32).toChar)
    assert(Bpe.byteCharTable(127) === (256 + 33).toChar && Bpe.byteCharTable(160) === (256 + 66).toChar)
    assert(Bpe.byteCharTable(173) === (256 + 67).toChar && Bpe.byteCharTable(255) === 255.toChar)
    // driver map == codegen'd kernel on ASCII, Latin-1, multi-byte, and empty
    val probes = Seq("", "hello", "déjà vu", "aàb", "€100", "snow☃man")
    val got = probes.toDF("s")
      .select(graft.functions.StringExprs.byte_alphabet(col("s")).as("m"))
      .as[String].collect().toSeq
    assert(got === probes.map(Bpe.byteMapStr))
  }

  test("byte-level trainer: multi-byte code points start split and earn their fusion") {
    // accented corpus: merges must fuse UTF-8 byte pairs of the 2-byte
    // vowels — the byte-fallback property in action. Hand-checked: pair
    // (d, Ã) ties (Ã, ©) at 14 (déjà×12 + dü×2 vs déjà×12 + ré×2) and
    // wins the UTF-8 byte-order tie-break (0x64 < 0xC3); merge 2 then
    // completes é's byte pair inside 'dÃ©'.
    val docs = Seq.fill(6)("déjà déjà") ++ Seq.fill(2)("ré dü")
    val got = Bpe.learnMergesBytes(docs.toDF("text"), "text", nMerges = 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val (dm, cm) = (Bpe.byteMapStr("d"), Bpe.byteMapStr("é"))
    assert(got(0) === ((dm + " " + cm.substring(0, 1), dm + cm.substring(0, 1), 14L)), got.toString)
    assert(got(1) === ((dm + cm.substring(0, 1) + " " + cm.substring(1), dm + cm, 12L)), got.toString)
    // on a pure-ASCII corpus the byte alphabet is the identity, so the
    // byte trainer IS the char trainer, row for row
    val ascii = Seq.fill(5)("lowest lowest newest").toDF("text")
    val a = Bpe.learnMerges(ascii, "text", nMerges = 6).orderBy("rank").collect().toSeq
    val b = Bpe.learnMergesBytes(ascii, "text", nMerges = 6).orderBy("rank").collect().toSeq
    assert(a === b)
  }

  test("fast trainer == distributed trainer, row-identical, through exhaustion") {
    // the delta-maintained driver loop and the one-job-per-merge
    // distributed loop must produce the SAME merge table — including where
    // they stop when the vocab runs out of adjacent pairs (nMerges past
    // exhaustion)
    val docs = (Seq.fill(5)("lowest lowest newest") ++ Seq.fill(4)("lower newer") ++
      Seq("aaaa aaaa baaa", "wide wide ride")).toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val fast = rows(Bpe.learnMerges(docs, "text", nMerges = 64))
    // driverVocabMax = 0 forces the BATCHED LOOP (the r13 degenerate-vocab
    // fast path would otherwise answer driver-side and leave it untested)
    val dist = rows(Bpe.learnMergesDistributed(docs, "text", nMerges = 64,
      driverVocabMax = 0))
    assert(fast === dist)
    // and the default gate (vocab ≤ budget ⇒ driver loop) must be invisible
    val gated = rows(Bpe.learnMergesDistributed(docs, "text", nMerges = 64))
    assert(gated === dist, "fast-path gate must not change the merge table")
    assert(fast.nonEmpty && fast.size < 64, "fixture must exhaust before 64 merges")
    // jobs <= a handful regardless of nMerges: 256 merges on the corpus
    // completes in driver time (would be 256 Spark jobs distributed)
    val big = Bpe.learnMerges(spark.read.parquet(s"$sfDir/documents.parquet"),
      "text", nMerges = 256).collect()
    assert(big.length < 256, "tiny-vocab corpus must exhaust before 256")
    assert(big.map(_.getLong(0)).toSeq === (1 to big.length).map(_.toLong))
  }

  test("batched distributed trainer: 256+ merges, jobs MUCH fewer than merges, row-identical to sequential") {
    // r9 capped the distributed path at nMerges <= 64 (one agg + argmax job
    // per merge); the batched trainer must reach tokenizer-range merge
    // counts with O(rounds) jobs. Corpus: 300 distinct words, spread
    // weights (spread pair counts => fat, provably-sequential batches).
    // SPREAD-COUNT regime: two-symbol words over a wide (220-codepoint)
    // alphabet with Zipf-ish weights — top pair counts are mostly
    // symbol-disjoint and strictly ordered, which is where exact batching
    // is allowed to go wide (measured ~80 jobs / 300 merges). The opposite
    // regime — a chain fixture like "pre<i>fix<i>tail", or any 26-letter
    // corpus early in training — serializes BPE intrinsically (the minted
    // pair (pr,e) really is sequential's next argmax after (p,r)), and
    // there the cap correctly collapses batches to 1-2: more rounds,
    // never a wrong merge (the `fast == distributed through exhaustion`
    // test above covers that regime).
    val rnd = new scala.util.Random(7)
    val words = (0 until 500).map(_ =>
      (0 until 2).map(_ => (0x100 + rnd.nextInt(220)).toChar).mkString).distinct
    val corpus = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(4000 / (i + 3) + 1)(w) }.mkString(" ")
    val df = Seq(corpus).toDF("text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val fast = rows(Bpe.learnMerges(df, "text", nMerges = 300))
    assert(fast.length === 300, "fixture must sustain 300 merges (no early exhaustion)")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val dist =
      try rows(Bpe.learnMergesDistributed(df, "text", nMerges = 300,
        driverVocabMax = 0)) // force the loop: this test PINS its batching
      finally {
        // listener bus is async: wait for the count to stabilize before reading
        var prev = -1
        while (prev != jobs.get()) { prev = jobs.get(); Thread.sleep(250) }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(dist === fast, "batched distributed merges must replay sequential BPE exactly")
    assert(jobs.get() < 300 / 2,
      s"jobs (${jobs.get()}) must be MUCH fewer than merges (300) — batching broke")
  }

  test("learnMerges maxVocab bound fails loudly with the fallback named") {
    val docs = Seq("a b c d e f").toDF("text")
    val e = intercept[IllegalArgumentException](
      Bpe.learnMerges(docs, "text", nMerges = 2, maxVocab = 3))
    assert(e.getMessage.contains("learnMergesDistributed"))
  }

  test("applyMerges replays training: segmenting a training word yields its final symbols") {
    val docs = Seq.fill(3)("banana bandana").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 4)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // reference final segmentation of "banana" after the same 4 merges
    val ref = referenceMerges(Map("banana" -> 3L, "bandana" -> 3L), 4)
    var syms = "banana".map(_.toString).toVector
    for ((p, m, _) <- ref) {
      val Array(l, r) = p.split(" ")
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length)
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += m; i += 2 }
        else { b += syms(i); i += 1 }
      syms = b.result()
    }
    val got = Seq("banana").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges).as("s"))
      .collect().head.getSeq[String](0)
    assert(got === syms)
  }

  test("adjacent-run semantics: wrapped-symbol replace merges runs leftmost-greedy") {
    // pair (a,a) over "aaaa": textbook greedy gives [aa, aa]; over "aaaaa":
    // [aa, aa, a] — the case a space-separated replace encoding gets wrong
    // (the consumed separator hides the second adjacent occurrence)
    val out = Seq("aaaa", "aaaaa", "a", "").toDF("w")
      .select(Bpe.applyMerges(col("w"), Seq(("a a", "aa"))).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("aa", "aa"))
    assert(out(1) === Seq("aa", "aa", "a"))
    assert(out(2) === Seq("a"))
    assert(out(3) === Seq.empty)
  }

  test("batched trainer at tokenizer scale: 1024 exact merges, jobs/merges <= 0.3 (r10 verdict #3)") {
    // The cap lift is only worth its complexity if jobs << merges HOLDS at
    // real vocab scale. Spread regime scaled up: ~1300 distinct two-symbol
    // words over a 2000-codepoint alphabet (symbol collisions rare, so
    // accepted batches stay provably-sequential AND wide) with strictly
    // decreasing weights (no count ties narrowing batches). The sequential
    // driver trainer is the oracle twin (the 256-round DuckDB CTE of q257
    // does not stretch to 1024; twin-equality is the pin, per the r10
    // verdict), and the Spark listener counts ACTUAL scheduled jobs.
    val rnd = new scala.util.Random(11)
    val words = (0 until 1400).map(_ =>
      (0 until 2).map(_ => (0x100 + rnd.nextInt(2000)).toChar).mkString).distinct
    assert(words.length >= 1300, s"fixture needs >=1300 distinct words, got ${words.length}")
    val rows0 = words.zipWithIndex.map { case (w, i) =>
      ((words.length - i).toLong, w) } // strictly decreasing weights
    // corpus as one row per word, the word repeated weight times — the
    // trainer only sees exploded tokens, so this is weight-equivalent to a
    // flat corpus without building a multi-MB string
    val df = rows0.map { case (wt, w) => Seq.fill(wt.toInt)(w).mkString(" ") }.toDF("text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val fast = rows(Bpe.learnMerges(df, "text", nMerges = 1024))
    assert(fast.length === 1024, "fixture must sustain 1024 merges (no early exhaustion)")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val dist =
      try rows(Bpe.learnMergesDistributed(df, "text", nMerges = 1024,
        driverVocabMax = 0)) // force the loop: this test PINS its job bound
      finally {
        var prev = -1
        while (prev != jobs.get()) { prev = jobs.get(); Thread.sleep(250) }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(dist === fast, "batched distributed merges must replay sequential BPE exactly")
    info(s"jobs = ${jobs.get()} for 1024 merges (ratio ${jobs.get() / 1024.0})")
    assert(jobs.get() * 10 <= 1024 * 3,
      s"jobs (${jobs.get()}) / merges (1024) must be <= 0.3 in the spread regime")
  }
}
