package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located join (SURVEY "partitioning & shuffle"): writing both
  * fact tables bucketed+sorted on the join key lets the sort-merge join run
  * with NO exchange and NO sort — the 100 TB pattern for repeated joins on
  * a stable key (bucket pruning + shuffle elimination amortize the one-time
  * bucketed write).
  */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without Exchange") {
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables across JVMs but their files
    // survive in the warehouse dir — clear them so CTAS can recreate
    val wh = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    spark.read.parquet(s"$d/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet(s"$d/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // force the sort-merge path (tiny sf0.001 tables would broadcast,
    // which is not the pattern under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the join must not shuffle either side on the join key (only the
    // final group-by aggregation exchanges)
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
      && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      plan.take(3000))

    // and it computes the right answer
    val direct = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(direct).count() == 0)
  }
}
