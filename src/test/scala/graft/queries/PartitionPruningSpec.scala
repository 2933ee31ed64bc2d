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

  test("IVF cell layout: probing two cells prunes every other cell's files") {
    // the 100 TB shape of Similarity.topKIvf: persist the celled corpus
    // partitioned by cell, and a probe of nprobe cells must turn into
    // directory pruning — the scan never lists the other cells' files
    import graft.operators.Similarity
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (assigned, _) = Similarity.ivfIndexCached(spark, "prune-spec")(corpus)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_part_cells"
    assigned.write.mode("overwrite").partitionBy("cell").parquet(out)

    val probed = spark.read.parquet(out).filter(col("cell").isin(0, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(1500))
    val expect = assigned.filter(col("cell").isin(0, 3)).count()
    assert(probed.count() == expect && expect > 0)
  }
}
