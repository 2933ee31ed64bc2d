package graft.queries

import graft.SparkSpec

/** Physical-plan audits: the properties that make these plans survive a
  * 100× scale-up, asserted against explain output so regressions fail CI
  * (SURVEY §4.2/§4.3 discipline).
  */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("q02: filters and projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(1500))
    // pruned read schema: only the 7 referenced columns, not all 11
    assert(!p.contains("l_returnflag"), "scan reads unneeded columns")
  }

  test("q03: dimension joins are broadcast, no shuffle of dims") {
    val p = plan("q03_regional_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q04: explicitly broadcast filtered dim -> BHJ on the fact scan") {
    val p = plan("q04_broadcast_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#13)")
      || p.contains("EqualTo(p_brand,Brand#13)"), p.take(1500))
  }

  test("q10: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q19: banded range join has an equi key — no nested-loop join") {
    assert(!plan("q19_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("assay pass-1: specimen dimension joins are broadcast (A3 build side)") {
    val p = plan("fhir_assay_pass1")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q34: salted aggregation keeps decimal partials (no double partials)") {
    val p = plan("q34_salted_skew_agg")
    assert(p.contains("partial_sum") && p.contains("pmod"), p.take(1500))
  }

  test("q01: two-phase aggregation (map-side partials) + codegen in final plan") {
    val df = graft.SparkEntry.queries("q01_pricing_summary")(spark, d)
    val pre = df.queryExecution.executedPlan.toString
    // partial + final HashAggregate: the shuffle carries group partials only
    assert(pre.contains("partial_sum"), pre.take(1500))
    df.collect() // AQE finalizes the plan; codegen markers appear post-run
    val post = df.queryExecution.executedPlan.toString
    // "*(n) " prefixes = whole-stage-codegen'd stages
    assert(post.contains("*("), post.take(1500))
  }
}
