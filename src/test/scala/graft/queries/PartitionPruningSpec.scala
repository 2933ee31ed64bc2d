package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning (SURVEY §4.2): a type-partitioned store layout must
  * turn per-type filters into directory pruning — at 100 TB the FHIR
  * store is parquet partitioned by resource type / project, and a
  * `resourceType = X` predicate must never touch other types' files.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes partitions at scan time") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_part_events"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan.take(1500))
    // pruned scan reads exactly the one partition's rows
    val direct = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(q.count() == direct)
  }
}
