package graft.operators

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-scoped MERGE (Layout.mergeIntoPartitioned): upsert
  * semantics must hold row-exactly AND the copy-on-write must be scoped
  * — untouched partitions' files stay byte-identical (same names, sizes,
  * mtimes: never opened for write), touched partitions are rewritten.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  test("merge replaces + inserts in touched partitions; untouched files byte-identical") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_${spark.sparkContext.applicationId}"
    val base = Seq(
      (1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c", 30.0, "p1"),
      (4L, "d", 40.0, "p2"), (5L, "e", 50.0, "p2"),
      (6L, "f", 60.0, "p3")
    ).toDF("k", "v", "x", "part")
    base.write.mode("overwrite").partitionBy("part").parquet(dir)
    val before = fileState(dir)

    // update key 1 (replace), insert key 7 — both in p1; p2/p3 untouched
    val updates = Seq((1L, "A2", 11.0, "p1"), (7L, "new", 70.0, "p1"))
      .toDF("k", "v", "x", "part")
    Layout.mergeIntoPartitioned(spark, dir, updates, "k", "part")

    val got = spark.read.parquet(dir)
      .select(col("k"), col("v"), col("x"), col("part"))
      .as[(Long, String, Double, String)].collect().toSet
    assert(got == Set(
      (1L, "A2", 11.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c", 30.0, "p1"),
      (7L, "new", 70.0, "p1"),
      (4L, "d", 40.0, "p2"), (5L, "e", 50.0, "p2"),
      (6L, "f", 60.0, "p3")), s"merge result wrong: $got")

    val after = fileState(dir)
    // copy-on-write scope: every untouched-partition file is literally
    // the same file (path, size, mtime); every p1 file is new
    val beforeUntouched = before.filter(!_._1.contains("part=p1"))
    val afterUntouched = after.filter(!_._1.contains("part=p1"))
    assert(afterUntouched == beforeUntouched,
      "untouched partition files changed — merge was not partition-scoped")
    val beforeP1 = before.keySet.filter(_.contains("part=p1"))
    val afterP1 = after.keySet.filter(_.contains("part=p1"))
    assert(afterP1.intersect(beforeP1).isEmpty,
      "touched partition kept an old data file")

    // partitionOverwriteMode restored (the operator must not leak the
    // dynamic setting into the session)
    assert(!spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("dynamic"))

    // empty update batch is a no-op, not a table wipe
    Layout.mergeIntoPartitioned(spark, dir,
      updates.filter(col("k") < 0), "k", "part")
    assert(fileState(dir) == after, "empty merge modified the table")
  }
}
