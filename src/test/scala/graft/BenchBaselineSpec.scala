package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's committed-baseline parser: the >3×-outlier rerun
  * pass (VERDICT r9 item 1) keys off BASELINE.md's per-query table, so
  * a silent table-format drift would quietly disable it. This spec
  * fails if the live file stops parsing into a near-complete gate map.
  */
class BenchBaselineSpec extends AnyFunSuite {

  test("BASELINE.md parses into a near-complete per-gate baseline") {
    val base = Bench.loadBaseline()
    val gates = SparkEntry.queries.keySet
    assert(base.size >= 200, s"only ${base.size} baseline rows parsed")
    // spot-pin long-stable rows
    for (g <- Seq("q01_pricing_summary", "dedup_editdistance", "mm_jpeg"))
      assert(base.contains(g), s"baseline row for $g not parsed")
    // every parsed row names a live gate (catches renames leaving stale rows)
    val stale = base.keySet -- gates
    assert(stale.isEmpty, s"baseline rows for unknown gates: $stale")
    // coverage: at most a handful of brand-new gates may lack a row
    val missing = gates -- base.keySet
    assert(missing.size <= 5,
      s"${missing.size} gates lack a baseline row (rerun pass blind for them): $missing")
    // values are plausible seconds
    assert(base.values.forall(v => v > 0 && v < 120))
  }

  test("a missing file or malformed rows degrade to empty, not a crash") {
    assert(Bench.loadBaseline("/nonexistent/BASELINE.md").isEmpty)
  }
}
