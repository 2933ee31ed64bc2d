package graft

/** Driver t1 smoke contract: entry() must return >0 rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every declared query has either an oracle or a rows-only rationale") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are exactly the GENUINELY approximate ones: HLL
    // (q27), G-K (q47) and the BPE stream digest. The LSH pair gates
    // graduated to hash-checked in round 11 (SQL-replayable MinHash61
    // family); the ANN top-k gates graduated in round 12 via their
    // forced-exhaustive regimes (IVF nprobe = all cells, PQ corpus-sized
    // rerank — exhaustive ANN is exact, so the brute-force oracle
    // applies through the unchanged index/probe/rank code).
    // text_compress_ratio is rows-only by necessity: DuckDB cannot
    // deflate, so no SQL oracle can exist — TextOpsSpec pins exact
    // vectors against a direct JDK Deflater replay instead.
    // sample_pack_bpe composes the trained BPE (no SQL oracle, same
    // necessity as text_bpe_tokens) with the packing prefix sum; BpeSpec
    // pins it against bpe_replay.py's pack digest, and the prefix sum
    // itself stays hash-checked via sample_pack_spans.
    assert(noOracle == Set(
      "q27_approx_distinct", "q47_approx_quantile", "text_bpe_tokens",
      "text_compress_ratio", "sample_pack_bpe"))
  }
}
