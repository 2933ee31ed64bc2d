package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `<dir>/<name>.parquet`. Reading is a
  * plain columnar parquet scan, so Catalyst pushes filters and prunes
  * columns into the scan (verify via `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One base DataFrame per (session, dir, table): re-reading a path
    * builds a fresh InMemoryFileIndex (a full file listing + footer
    * schema read) every time — trivial on a local dir, an O(files)
    * object-store listing storm when hundreds of queries each re-list a
    * 100 TB table. Reusing the DataFrame reuses its resolved relation
    * (and its listing) exactly like resolving through a catalog table;
    * plans built FROM it still push filters/pruning per query.
    */
  private val relationCache = new graft.util.SessionCache[DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.getOrElseUpdate(spark, s"$dir/$name")(
      spark.read.parquet(s"$dir/$name.parquet"))

  /** Register every table as a temp view so `spark.sql` front-end queries
    * (GROUPING SETS, FHIR-search-generated SQL, ad-hoc) resolve by name.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => load(spark, dir, n).createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, unsupported by Spark's reader.
    * With spark.sql.legacy.parquet.nanosAsLong (GraftSession) it surfaces
    * as LongType nanos; convert to a µs timestamp with integral division
    * (values are µs-aligned, so this is exact — and `div` avoids the
    * double-precision loss a `/` would incur on 1e18-scale nanos).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
