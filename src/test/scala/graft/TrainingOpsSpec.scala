package graft

import graft.ops.RelOps
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Round-3 training-data operators: repetition stats, chunking boundaries,
  * deterministic sampling, z-scores, scaling, and the stream-stream join's
  * batch equivalence.
  */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramsFromTokens: adjacent pairs; 0/1-token inputs yield empty") {
    val df = Seq("a b c d", "solo", "", "x y").toDF("text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(TextOps.bigramsFromTokens(col("toks")).as("bg"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("a b", "b c", "c d"), Nil, Nil, List("x y")))
  }

  test("chunkStarts covers every token exactly once per stride step") {
    val df = Seq(0L, 1L, 96L, 97L, 128L, 224L, 300L).toDF("n")
      .select(col("n"), TextOps.chunkStarts(col("n"), 96).as("starts"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got(0L) === Nil)
    assert(got(1L) === List(0L))
    assert(got(96L) === List(0L))       // 96 tokens fit the first chunk's window
    assert(got(97L) === List(0L, 96L))
    assert(got(128L) === List(0L, 96L))
    assert(got(224L) === List(0L, 96L, 192L))
    assert(got(300L) === List(0L, 96L, 192L, 288L))
  }

  test("hashSampleFilter is deterministic, key-stable, and rate-monotone") {
    val keys = (1L to 2000L).toDF("k")
    def kept(rate: Double): Set[Long] =
      keys.filter(RelOps.hashSampleFilter(col("k"), rate)).collect().map(_.getLong(0)).toSet
    val r10a = kept(0.1); val r10b = kept(0.1)
    assert(r10a === r10b, "same rate twice must select identical keys")
    val r50 = kept(0.5)
    assert(r10a.subsetOf(r50), "a lower-rate sample must nest inside a higher-rate one")
    // rates are approximate but must be in the right ballpark on 2000 keys
    assert(r10a.size > 100 && r10a.size < 300, s"10% of 2000 ≈ 200, got ${r10a.size}")
    assert(r50.size > 800 && r50.size < 1200, s"50% of 2000 ≈ 1000, got ${r50.size}")
    assert(kept(0.0).isEmpty)
    assert(kept(1.0).size === 2000)
  }

  test("hashSplit partitions the keyspace; train bucket equals the 80% sample") {
    val keys = (1L to 3000L).toDF("k")
    val labeled = keys.select(col("k"),
        RelOps.hashSplit(col("k"), Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labeled.size === 3000, "every key gets exactly one label")
    val byLabel = labeled.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 2200 && byLabel("train") < 2600, byLabel.toString)
    assert(byLabel("val") > 150 && byLabel("val") < 450, byLabel.toString)
    // the split's train bucket and the standalone 80% sample must agree
    // key-for-key (same hash, same threshold) — splits nest inside samples
    val sampled = keys.filter(RelOps.hashSampleFilter(col("k"), 0.8))
      .collect().map(_.getLong(0)).toSet
    assert(labeled.filter(_._2 == "train").keySet === sampled)
  }

  test("zscore matches stddev_samp-based z within float tolerance") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 10L),
      ("b", 5L), ("b", 5L), ("b", 8L)).toDF("g", "x")
    val got = RelOps.zscore(df, "g", col("x"), "z")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val stats = df.groupBy("g").agg(avg("x").as("mu"), stddev_samp("x").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (((g, x), z) <- got) {
      val (mu, sd) = stats(g)
      assert(math.abs(z - (x - mu) / sd) < 1e-9, s"($g,$x): $z")
    }
  }

  test("minMaxScale: [0,1] bounds, endpoints exact, constant group -> 0.5") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 15.0), ("c", 7.0), ("c", 7.0))
      .toDF("g", "x")
    val got = RelOps.minMaxScale(df, "g", col("x"), "s")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 10.0)) === 0.0)
    assert(got(("a", 20.0)) === 1.0)
    assert(got(("a", 15.0)) === 0.5)
    assert(got(("c", 7.0)) === 0.5)
  }

  test("q91 stream-stream join equals the batch self-join") {
    val batch = {
      val ev = Tables.events(spark, sfDir)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      c.join(p, col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 minutes"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("c_id")).as("n_lefts"),
          countDistinct(col("p_id")).as("n_rights"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    }
    val streamed = SparkEntry.queries("q91_stream_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed === batch)
  }

  test("SQL UDAF registration: graft_wavg from spark.sql equals the typed Aggregator (q73)") {
    spark.udf.register("graft_wavg",
      org.apache.spark.sql.functions.udaf(graft.typed.TypedAggs.WeightedMeanUdaf))
    Tables.lineitem(spark, sfDir).select(
        col("l_returnflag").as("returnflag"),
        col("l_quantity").cast("long").as("qty"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .createOrReplaceTempView("li_w")
    val viaSql = spark.sql(
        "SELECT returnflag, graft_wavg(qty, cents) AS wavg_price FROM li_w GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val typed = SparkEntry.queries("q73_typed_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql === typed)
  }

  test("q81 repetition fractions are consistent with their integer parts") {
    val rows = SparkEntry.queries("q81_repetition")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nTok, nUniq) = (r.getLong(1), r.getLong(2))
      val frac = r.getDouble(5)
      assert(nUniq <= nTok)
      if (nTok > 0) assert(math.abs(frac - (nTok - nUniq).toDouble / nTok) < 1e-15)
    }
  }

  test("q89 chunks tile each doc: contiguous coverage, bounded ends") {
    val rows = SparkEntry.queries("q89_chunk_windows")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    for ((_, chunks) <- rows) {
      val sorted = chunks.sortBy(_.getLong(2))
      for ((c, i) <- sorted.zipWithIndex) {
        assert(c.getLong(1) === i.toLong)           // chunk_idx dense
        assert(c.getLong(2) === i.toLong * 96)      // starts on stride
        assert(c.getLong(3) > c.getLong(2))         // non-empty window
        assert(c.getLong(3) <= c.getLong(2) + 128)  // bounded by chunk size
      }
    }
  }
}
