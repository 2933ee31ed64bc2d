package graft

/** Driver t1 smoke contract: entry() must return >0 rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every declared query has either an oracle or a rows-only rationale") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are exactly the approximate/engine-specific ones
    // (the LSH pair gates graduated to hash-checked in round 11 via the
    // SQL-replayable minhash family — functions/MinHash61.scala)
    assert(noOracle == Set("sim_topk_ivf",
      "sim_topk_pq", "q27_approx_distinct", "q47_approx_quantile",
      "text_bpe_tokens"))
  }
}
