package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the local[32] test harness but scale-minded: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to cores rather than the 200 default, UTC session time
  * zone for oracle parity, nested-schema pruning for the wide FHIR structs
  * (SURVEY.md §4.2).
  */
object GraftSession {

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName(appName),
      shufflePartitions = cores
    )

  /** Apply engine defaults to an existing builder (used by Verify/Bench which
    * own master/core selection per the driver contract).
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as long nanos and convert in Tables.events (values
      // are µs-aligned so the conversion is lossless).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
