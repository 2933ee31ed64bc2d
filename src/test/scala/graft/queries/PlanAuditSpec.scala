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

  test("q53: ORC re-read pushes filters and prunes columns like parquet") {
    // the roundtrip gate itself has no filter; assert the format's scale
    // properties directly on the written artifact
    // per-session path: two JVMs running the suite concurrently must not
    // overwrite/read the same artifact (same rationale as the q53 gate)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_orc_audit_" +
      graft.util.TempFixtures.appTag(spark)
    graft.util.TempFixtures.deleteOnExit(out)
    graft.sources.Tables.nation(spark, d).write.mode("overwrite").orc(out)
    val q = spark.read.orc(out)
      .filter(org.apache.spark.sql.functions.col("n_regionkey") === 2)
      .select("n_name")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)"),
      p.take(1500))
    assert(!p.contains("n_nationkey"), "ORC scan reads unneeded columns")
  }

  test("q10: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q10_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q19: banded range join has an equi key — no nested-loop join") {
    assert(!plan("q19_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("assay gates: no forced broadcast hints; the planner still picks BHJ (A3 build side)") {
    // The specimen and claimed-group dims scale with the store at 100 TB —
    // a forced broadcast() OOMs there instead of degrading, so the assay
    // joins must be hint-free and rely on stats/AQE to size the dims
    // (the same contract as fhir_dangling_refs below).
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val assayGates = Seq("fhir_assay_pass1", "fhir_assay_pass2",
      "fhir_assay_docs", "fhir_assay_groups", "fhir_assay_docs_nonr4")
    assayGates.foreach { g =>
      val hints = graft.SparkEntry.queries(g)(spark, d)
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty,
        s"$g carries a forced hint:\n${hints.map(_.child.treeString.take(300)).mkString}")
    }
    // ...and at reference scale the planner chooses the broadcast on its
    // own (final adaptive plan, so collect() before reading it)
    val df = graft.SparkEntry.queries("fhir_assay_pass1")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q34: salted aggregation keeps decimal partials (no double partials)") {
    val p = plan("q34_salted_skew_agg")
    assert(p.contains("partial_sum") && p.contains("pmod"), p.take(1500))
  }

  test("search_history_system_since: _count over the feed union plans as TakeOrderedAndProject") {
    val p = plan("search_history_system_since")
    assert(p.contains("TakeOrderedAndProject"),
      "system _history _count should plan as a top-k, not a global sort:\n" + p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("text_boilerplate: scan prunes to (doc_id, text); segment digests, not text, shuffle") {
    val p = plan("text_boilerplate")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "boilerplate should read only doc_id+text:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_span_coverage: fused ngram_hashes assigns spans — no per-word Generate before the hash") {
    val p = plan("dedup_span_coverage")
    assert(p.contains("ngram_hashes"),
      "span coverage should use the fused native shingle expression:\n" + p.take(1500))
  }

  test("search_paging: offset+limit plans as TakeOrderedAndProject, no global window") {
    val df = graft.SparkEntry.queries("search_paging")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("dedup_embedding_cosine: cells assigned by the fused expression; nothing corpus-sized broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation, ResolvedHint}
    val df = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, d)
    // assignment is the native ivf_cells expression (a map over the
    // corpus), not a broadcast join — round 6 replaced the exploded
    // centroid join whose aggregate grew with n·ncells
    assert(df.queryExecution.analyzed.toString.contains("ivf_cells"),
      df.queryExecution.analyzed.toString.take(1500))
    // any remaining broadcast hint must cover only metadata-sized local
    // relations (centroids) — a file scan under a hint would mean the
    // corpus itself is being broadcast
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    hints.foreach { h =>
      val leaves = h.child.collect { case l: LeafNode => l }
      assert(leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalRelation]),
        s"broadcast hint over non-local subtree:\n${h.child.treeString.take(800)}")
    }
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

  test("sample_bernoulli: pure map-side filter — no exchange before the sort") {
    // sampling must never shuffle: scan → filter → (output sort only)
    val df = graft.SparkEntry.queries("sample_bernoulli")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    val beforeSort = p.substring(p.indexOf("Filter"))
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"hash exchange under the sampling filter:\n${p.take(1500)}")
  }

  test("sample_decontaminate: benchmark shingle set is broadcast, train side streams") {
    val p = plan("sample_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q27: no Expand — exact+approx distinct feed from one pre-deduped shuffle") {
    val p = plan("q27_approx_distinct")
    assert(!p.contains("Expand"), p.take(1500))
  }

  test("fhir_dangling_refs: the id universe is never hint-broadcast") {
    // the (rtype, rid) union is store-sized at 100 TB — a forced
    // broadcast OOMs exactly at the scale the audit targets. Size-based
    // broadcast chosen by stats/AQE is fine; a ResolvedHint is not.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.SparkEntry.queries("fhir_dangling_refs")(spark, d)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, hints.map(_.child.treeString.take(300)).mkString)
  }

  test("fused expressions hold their plans: no join/explode rebuilds them") {
    // text_lm_typicality: bigram counts come from the native expression,
    // not an explode-per-character + hash aggregate
    val typ = graft.SparkEntry.queries("text_lm_typicality")(spark, d)
    val typPlan = typ.queryExecution.analyzed.toString
    assert(typPlan.contains("char_bigram_counts"), typPlan.take(1200))
    assert(!typPlan.contains("sequence(1"), "per-character explode is back")
    // dedup_embedding_rhp: band keys from the native projection, with no
    // hyperplane join under the band derivation
    val rhp = graft.SparkEntry.queries("dedup_embedding_rhp")(spark, d)
    val rhpPlan = rhp.queryExecution.analyzed.toString
    assert(rhpPlan.contains("rhp_bands"), rhpPlan.take(1200))
  }

  test("search_history: the id literal reaches the history feed filter") {
    val p = plan("search_history")
    assert(p.contains("p-010"), p.take(1500))
    // instance history must not touch the current-state Patient table
    assert(!p.contains("fixtures/fhir/Patient.ndjson"),
      "history read the current table instead of the feed")
  }

  test("search_history_current: last-wins view is ONE hash aggregate, no window sort") {
    val df = graft.SparkEntry.queries("search_history_current")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "snapshot compaction must not window-sort")
    assert(p.contains("max_by") || p.contains("HashAggregate"), p.take(1500))
  }

  test("search_token_below: the closure expands to literal predicates, no terminology join") {
    val p = plan("search_token_below")
    // plan-time expansion: descendant codes burned in as literals
    assert(p.contains("44054006"), p.take(2000))
    // ...and the CodeSystem table is gone from the executed plan
    assert(!p.contains("CodeSystem.ndjson"),
      "subsumption planned as a runtime join against the terminology table")
  }

  test("text_bpe_first_merge: pair counting is two-phase (map-side partials)") {
    val df = graft.SparkEntry.queries("text_bpe_first_merge")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject") || p.contains("Sort"),
      "argmax should be a bounded top-1, not a full materialization")
  }

  test("sample_decontaminate_semantic: train side never shuffles; benchmark broadcasts") {
    val df = graft.SparkEntry.queries("sample_decontaminate_semantic")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    // the only exchange allowed is the benchmark broadcast (plus the
    // final orderBy's range partitioning); no hash shuffle of train rows
    assert(!p.contains("hashpartitioning"),
      "train rows were shuffled — the map-side max was lost")
  }

  test("ServiceRequest array-ref chain and _has: exploded equi-joins, " +
      "never an array-contains nested loop") {
    for (g <- Seq("search_servicerequest_specimen", "search_has_specimen")) {
      val p = plan(g)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$g plans a non-equi join:\n${p.take(1500)}")
    }
    // the chain through the specimen array is two semi-joins on equi keys
    val chain = graft.fhir.FhirSearch
      .overFixtures(spark, "/root/repo/fixtures/fhir")
      .search("ServiceRequest?specimen.subject=Patient/p-001")
      .queryExecution.executedPlan.toString
    assert(!chain.contains("BroadcastNestedLoopJoin") &&
      !chain.contains("CartesianProduct"), chain.take(1500))
  }

  test("global sweep: no query ever plans a CartesianProduct") {
    // cross joins in the repo are all 1-row/tiny broadcast sides (stats,
    // LUTs, invariant counters) and plan as BroadcastNestedLoopJoin; an
    // unbroadcast CartesianProduct anywhere is an n² regression that must
    // fail CI no matter which gate introduces it
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("sim_topk_pq: shortlist runs through the native heap operator, not a Window") {
    val df = graft.SparkEntry.queries("sim_topk_pq")(spark, d)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      p.take(1500))
  }

  test("search_docref_related (r20): the assay back-link is a scan-local " +
      "array-exists predicate — no join of any kind; the chain through " +
      "the array stays equi-joins end to end") {
    // "which documents belong to this Assay?" must cost one filtered
    // scan of the doc store at 100 TB, never a join against
    // ServiceRequest; the exists predicate evaluates per row at the scan
    val p = plan("search_docref_related")
    assert(!p.contains("Join"), p.take(1500))
    assert(p.toLowerCase.contains("exists"), p.take(1500))
    // the type-qualified chain routes through the exploded equi-semi-join
    // (ArrayRefParams) — never an array-contains theta join, which would
    // plan a nested loop at scale
    val chain = plan("search_docref_related_chain")
    assert(!chain.contains("BroadcastNestedLoopJoin") &&
      !chain.contains("CartesianProduct"), chain.take(1500))
  }

  test("fhir_update_create (r20): the prior-version map is one " +
      "shuffle-on-id aggregation — no window sort, no forced broadcast") {
    // version assignment must scale like the log-to-snapshot compaction
    // it mirrors: HashAggregate on id, the micro-batch joined by AQE's
    // choice (unforced), never a global Window over the feed
    val df = graft.fhir.FhirStore.updateCreateRows(
      graft.fhir.FhirIO.readNdjson(spark,
        "/root/repo/fixtures/fhir/Patient.history.ndjson",
        graft.fhir.FhirSchemas.patient),
      graft.fhir.FhirIO.readNdjson(spark,
        "/root/repo/fixtures/fhir/Patient.ingest.ndjson",
        graft.fhir.FhirSchemas.patient),
      "2025-01-15T00:00:00Z")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec") && !p.contains("Window "), p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(!p.contains("broadcast(") || !p.contains("ResolvedHint"),
      "forced broadcast hint on the feed side")
  }
}
