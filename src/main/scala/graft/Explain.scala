package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan inspector: prints the formatted physical plan of named queries —
  * the `.explain("formatted")` loop the build process runs after every
  * operator lands (see PLANS.md for annotated excerpts).
  *
  * Usage: runMain graft.Explain <sfDir> <queryName> [<queryName> ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q03_regional_revenue", "q37_auto_topk", "q44_partition_pruning",
        "q45_bucketed_join", "q50_salted_skew_join", "q51_zorder_scan",
        "dedup_minhash_lsh", "dedup_editdistance", "sim_topk_pq")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      println(s"\n===== $name =====")
      println(fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
