package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // pair-finding queries can legitimately be empty at the tiny sf0.001 scale;
  // q230: the 80-core of the sf0.001 co-purchase graph is empty (max degree
  // 138, the peel cascades to nothing — the documented ER-collapse property;
  // non-empty at sf0.01/sf0.1 where the driver's gates run)
  private val mayBeEmptyAtTinySf =
    Set("q35_jaccard_pairs", "q36_minhash_lsh", "q37_simhash_neardup", "q41_embed_neardup",
      "q42_ngram_jaccard", "q230_kcore",
      "q254_containment_pairs", "q255_containment_indexed")

  test("every declared query runs on sf0.001; non-pair queries return rows") {
    val empties = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0 && !mayBeEmptyAtTinySf(name)) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with zero rows: $empties")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // approximate/sketch/stub operators whose values are engine-specific by
  // nature; each maps to the oracle-checked exact twin / spec pinning it
  // (single source of truth in SparkEntry, published by Verify)
  private val rowsOnlyByDesign = SparkEntry.rowsOnlyByDesign.keySet

  test("every query has an oracle unless it is rows-only by design") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(unoracled.isEmpty,
      s"queries missing an oracle (add SQL or justify rows-only): $unoracled")
    val stale = rowsOnlyByDesign -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only allowlist entries with no query: $stale")
  }
}
