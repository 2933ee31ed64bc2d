package graft.util

import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** [[MetaJson]] replaced the DataFrame JSON job per metadata read/write in
  * the index-maintenance paths (round 21). The contract it must keep: the
  * on-disk layout stays interchangeable with the DataFrame JSON writer's,
  * both directions, so pre-existing indexes keep reading and any straggler
  * `spark.read.json` keeps parsing.
  */
class MetaJsonSpec extends SparkSpec {

  private def fs = new Path(tmpDir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tmpDir = System.getProperty("java.io.tmpdir")

  test("roundtrip: write then read returns the exact value") {
    val dir = s"$tmpDir/metajson_rt_${System.nanoTime()}"
    val v = "[[1.0,2.5E-4,-3.0],[4.0,5.0,6.0]]|[0.1,0.2]"
    MetaJson.write(fs, dir, "centroids", v)
    assert(MetaJson.read(fs, dir, "centroids") === v)
    // overwrite replaces, never appends
    MetaJson.write(fs, dir, "centroids", "[[9.0]]")
    assert(MetaJson.read(fs, dir, "centroids") === "[[9.0]]")
    fs.delete(new Path(dir), true)
  }

  test("spark.read.json parses a MetaJson-written directory") {
    val dir = s"$tmpDir/metajson_spark_${System.nanoTime()}"
    MetaJson.write(fs, dir, "codebook", "[[[1.0,2.0]]]")
    val got = spark.read.json(dir)
      .select(org.apache.spark.sql.functions.col("codebook"))
      .head().getString(0)
    assert(got === "[[[1.0,2.0]]]")
    fs.delete(new Path(dir), true)
  }

  test("MetaJson reads a Spark-DataFrame-written directory (old indexes)") {
    val dir = s"$tmpDir/metajson_compat_${System.nanoTime()}"
    import spark.implicits._
    Seq("[0.5,1.5]|[2.5,3.5]").toDF("bounds").coalesce(1)
      .write.mode("overwrite").json(dir)
    assert(MetaJson.read(fs, dir, "bounds") === "[0.5,1.5]|[2.5,3.5]")
    fs.delete(new Path(dir), true)
  }

  test("escaping: quotes, backslashes and control chars survive") {
    val dir = s"$tmpDir/metajson_esc_${System.nanoTime()}"
    val v = "a\"b\\c\nd\te"
    MetaJson.write(fs, dir, "f", v)
    assert(MetaJson.read(fs, dir, "f") === v)
    // and Spark parses the same escaped record identically
    val got = spark.read.json(dir)
      .select(org.apache.spark.sql.functions.col("f")).head().getString(0)
    assert(got === v)
    fs.delete(new Path(dir), true)
  }
}
