package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query packs contributing to the correctness/bench surface. */
  def packs: Seq[QueryPack] =
    Seq(RelationalPack, FhirPack, SearchPack, DedupPack, SimilarityPack,
      TextPack, StreamPack, SamplePack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q03: multi-way broadcast+shuffle join with exact aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalPack.queries("q03_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
