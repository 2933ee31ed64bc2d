package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q27 approx_count_distinct within 10% of exact (HLL++ rsd 5% ≈ 2σ)") {
    val df = RelationalPack.queries("q27_approx_distinct")(spark, "/root/testdata/sf0.01")
    val bad = df.filter(
      abs(col("approx_orders") - col("exact_orders")) >
        col("exact_orders") * 0.10)
    assert(bad.count() == 0)
  }

  test("q19 banded range join plans with an equi-join key (no BNLJ)") {
    val plan = RelationalPack.queries("q19_range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q20 as-of join has no join at all (single-pass window)") {
    val plan = RelationalPack.queries("q20_asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(2000))
    assert(plan.contains("Window"))
  }

  test("q42 correlated EXISTS/NOT EXISTS decorrelate to semi + anti joins") {
    val plan = RelationalPack
      .queries("q42_exists_subquery")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
    assert(!plan.contains("NestedLoop"), plan.take(3000))
  }

  test("q44 read side prunes partitions (PartitionFilters on o_month)") {
    val plan = RelationalPack
      .queries("q44_partition_pruning")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_month"),
      plan.take(3000))
  }

  test("q46 hint selects a shuffled hash join (no sort on either side)") {
    val plan = RelationalPack
      .queries("q46_shuffled_hash_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("q47 approx quartiles within 5% of q38 exact quartiles") {
    val d = "/root/testdata/sf0.01"
    val approx = RelationalPack.queries("q47_approx_quantile")(spark, d)
    val exact = RelationalPack.queries("q38_percentiles")(spark, d)
      .select(col("l_returnflag"), col("q25").as("e25"), col("q50").as("e50"),
        col("q75").as("e75"))
    val bad = approx.join(exact, "l_returnflag").filter(
      abs(col("q25") - col("e25")) > col("e25") * 0.05 ||
      abs(col("q50") - col("e50")) > col("e50") * 0.05 ||
      abs(col("q75") - col("e75")) > col("e75") * 0.05)
    assert(bad.count() == 0)
  }

  test("q45 bucketed join shuffles neither side on the join key") {
    val plan = RelationalPack
      .queries("q45_bucketed_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey")
      && !plan.contains("Exchange hashpartitioning(l_orderkey"),
      plan.take(3000))
  }
}
