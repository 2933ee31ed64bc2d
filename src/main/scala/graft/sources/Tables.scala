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
  /** events.ts has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (unsupported by Spark's reader;
    * surfaced as LongType nanos via spark.sql.legacy.parquet.nanosAsLong)
    * and plain timestamp[us]. Branch on the dtype the scan actually
    * resolved so either generation loads — a silent format drift here
    * previously took out every windowed/streaming query at analysis time.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Canonicalize an events-shaped frame's `ts` column to TimestampType
    * (session-zone, UTC per GraftSession) regardless of how it arrived:
    *
    *  - LongType: epoch nanos from the nanosAsLong legacy read. Integral
    *    `div 1000` (values are µs-aligned so this is exact, and `div`
    *    avoids the double-precision loss `/` would incur on 1e18-scale
    *    nanos) then timestamp_micros.
    *  - TimestampNTZType: timestamp[us] with isAdjustedToUTC=false. The
    *    session zone is UTC, so the NTZ→LTZ cast is value-preserving and
    *    keeps every downstream comparison against to_timestamp literals,
    *    window()/session_window(), and the naive-timestamp oracle intact.
    *  - TimestampType: already canonical; pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
