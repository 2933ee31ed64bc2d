package graft
import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line the driver records as BENCH_r{N}.json.
  *
  * Each query is forced through a `noop` sink so the FULL plan executes
  * (a bare `count()` lets Catalyst drop sorts and collapse projections,
  * systematically understating cost). Failures are recorded per-query as
  * negative sentinel timings plus an "errors" map — a broken query must
  * never masquerade as a fast success.
  *
  * Isolation: `clearCache()` after every query. Several operators cache
  * intermediate frames (LSH band index, assay pipeline); leaking those
  * across the 90+ shared-JVM queries builds storage-memory pressure that
  * inflates later timings (observed 5–40× mid-run in round 2's driver
  * bench). The JSON line is additionally persisted to
  * target/bench_latest.json so a truncated stdout capture can't lose it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          name -> -1.0
      } finally spark.catalog.clearCache()
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    try {
      val out = java.nio.file.Paths.get("target/bench_latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case _: Throwable => () } // file copy is best-effort
    spark.stop()
  }
}
