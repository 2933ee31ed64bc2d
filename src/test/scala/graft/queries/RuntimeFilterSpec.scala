package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Tables => T}

/** Runtime bloom-filter join pruning — the 100 TB feature the toy-scale
  * bench can never show: a selective filter on the dimension side of a
  * shuffle join injects a bloom filter onto the FACT side's scan, so at
  * real scale the fact table is row-group-pruned before the shuffle
  * instead of shipping every row to the join. Spark injects it only
  * above size thresholds (application side ≥ 10 GB by default), so this
  * spec lowers the thresholds to the fixture scale and pins that our
  * plan SHAPES accept the injection (a plan that hid the join behind a
  * non-equi condition, a UDF on the key, or a pre-aggregated subquery
  * would silently lose it) and that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter onto the fact scan; results unchanged") {
    // the representative shape: fact ⋈ selectively-filtered dim on the
    // join key, both sides file scans (the q03/q05 class)
    def query() = T.lineitem(spark, dir)
      .join(T.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plain = query().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // the 100 TB planner state: the dim is too big to broadcast, the
      // join shuffles — exactly when a bloom filter pays (Spark skips
      // injection for broadcast joins, which already avoid the shuffle)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected — join shape stopped qualifying:\n${plan.take(3000)}")
      val filtered = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(filtered == plain, "bloom-filtered plan changed results")
    }
    // and the default-config plan at this scale has none (thresholds):
    // documents the reason the bench totals never include the filter
    assert(!query().queryExecution.optimizedPlan.toString.contains("might_contain"))
  }
}
