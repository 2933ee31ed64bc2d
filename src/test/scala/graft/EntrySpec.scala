package graft

/** Driver t1 smoke contract: entry() must return >0 rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every declared query has either an oracle or a rows-only rationale") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are exactly the GENUINELY approximate ones: HLL
    // (q27) and G-K (q47) — Spark-internal sketches whose outputs no
    // independent engine can reproduce; both carry error-bound specs.
    // The LSH pair gates graduated to hash-checked in round 11
    // (SQL-replayable MinHash61 family); the ANN top-k gates in round 12
    // via their forced-exhaustive regimes (exhaustive ANN is exact, so
    // the brute-force oracle applies through the unchanged
    // index/probe/rank code); and the BPE/deflate trio (text_bpe_tokens,
    // sample_pack_bpe, text_compress_ratio) in round 20 via REPLAY
    // DIGESTS — the engine digests its output, the oracle looks the
    // committed independent Python replay's digest up by corpus
    // fingerprint (fixtures/replay_digests.csv), so the driver gate
    // itself now value-checks what DuckDB cannot recompute.
    assert(noOracle == Set("q27_approx_distinct", "q47_approx_quantile"))
  }
}
