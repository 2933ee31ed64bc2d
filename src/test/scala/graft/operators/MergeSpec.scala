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

  test("a key recurring across partitions loses only its own partition's row") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_xpart_${spark.sparkContext.applicationId}"
    // key 1 legitimately appears in BOTH touched partitions (the
    // "late facts arrived for two days" case): an update addressed to
    // p1 must not delete p2's key-1 row even when p2 is also touched
    // by a different key's update.
    Seq((1L, "day1", "p1"), (1L, "day2", "p2"), (2L, "x", "p2"))
      .toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val updates = Seq((1L, "day1-fixed", "p1"), (2L, "x-fixed", "p2"))
      .toDF("k", "v", "part")
    Layout.mergeIntoPartitioned(spark, dir, updates, "k", "part")
    val got = spark.read.parquet(dir).select(col("k"), col("v"), col("part"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "day1-fixed", "p1"), (1L, "day2", "p2"), (2L, "x-fixed", "p2")),
      s"cross-partition key was not partition-scoped: $got")
  }

  test("null partition values and missing columns are rejected loudly") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_guard_${spark.sparkContext.applicationId}"
    Seq((1L, "a", "p1")).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val nullPart = Seq((2L, "b")).toDF("k", "v")
      .withColumn("part", lit(null).cast("string"))
    val e1 = intercept[IllegalArgumentException] {
      Layout.mergeIntoPartitioned(spark, dir, nullPart, "k", "part")
    }
    assert(e1.getMessage.contains("null"), e1.getMessage)
    val narrow = Seq((2L, "p1")).toDF("k", "part") // missing v
    val e2 = intercept[IllegalArgumentException] {
      Layout.mergeIntoPartitioned(spark, dir, narrow, "k", "part")
    }
    assert(e2.getMessage.contains("missing table column"), e2.getMessage)
    // table untouched by either rejected merge
    val got = spark.read.parquet(dir).select(col("k"), col("v"), col("part"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "p1")))
  }

  test("merge deletes: tombstones remove rows; fully-deleted partitions drop their files") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_del_${spark.sparkContext.applicationId}"
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p2"))
      .toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val updates = Seq(
      (1L, "a", "p1", true), // tombstone
      (3L, "c", "p2", true), (4L, "d", "p2", true), // wipe p2 entirely
      (5L, "e", "p1", false)) // plain insert
      .toDF("k", "v", "part", "_deleted")
    Layout.mergeIntoPartitioned(spark, dir, updates, "k", "part",
      deleteCol = Some("_deleted"))
    val got = spark.read.parquet(dir).select(col("k"), col("v"), col("part"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((2L, "b", "p1"), (5L, "e", "p1")),
      s"delete merge wrong: $got")
    // the emptied partition's DIRECTORY is gone, not just its rows —
    // dynamic overwrite alone cannot do this
    assert(!new File(s"$dir/part=p2").exists(),
      "fully-deleted partition kept its files")
    assert(!new File(s"$dir/_merge_staging").exists())
  }

  test("merge staging: invisible to readers, cleaned on success, rolled FORWARD after a torn commit") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_stage_${spark.sparkContext.applicationId}"
    Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    Layout.mergeIntoPartitioned(spark, dir,
      Seq((1L, "a2", "p1")).toDF("k", "v", "part"), "k", "part")
    assert(!new File(s"$dir/_merge_staging").exists(),
      "staging dir survived a successful merge")
    assert(spark.read.parquet(dir).count() == 2)
    def rows() = spark.read.parquet(dir)
      .select(col("k"), col("v"), col("part"))
      .as[(Long, String, String)].collect().toSet

    // crash WINDOW 1: staging complete (the merge's OWN marker present)
    // but the overwrite never committed — simulated by planting the
    // staged merge of "replace key 1 in p1, insert key 9" plus the
    // marker the real merge writes after staging. It must be invisible
    // to readers, then ROLLED FORWARD by recovery (run implicitly by
    // the next merge call), not discarded. The committer's _SUCCESS is
    // deliberately DELETED first: cloud committers often run with
    // marksuccessfuljobs=false, and recovery must not depend on it
    // (the ADVICE r16 silent-row-loss window).
    Seq((1L, "a3", "p1"), (9L, "i", "p1")).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part")
      .parquet(s"$dir/_merge_staging")
    new File(s"$dir/_merge_staging/_SUCCESS").delete()
    assert(new File(s"$dir/_merge_staging/${Layout.StagedMarker}")
      .createNewFile())
    assert(spark.read.parquet(dir).count() == 2,
      "staging rows leaked into table reads")
    Layout.mergeIntoPartitioned(spark, dir,
      Seq((3L, "c", "p2")).toDF("k", "v", "part"), "k", "part")
    assert(rows() == Set(
      (1L, "a3", "p1"), (9L, "i", "p1"), // the torn merge rolled forward
      (2L, "b", "p2"), (3L, "c", "p2")), s"roll-forward wrong: ${rows()}")
    assert(!new File(s"$dir/_merge_staging").exists())

    // crash WINDOW 2: staging PARTIAL (no staged marker — the crash hit
    // during staging, before any live mutation): recovery drops it and
    // the table is untouched. The committer's _SUCCESS IS present (the
    // plain write produced it) — recovery must ignore it: only the
    // merge's own marker, written strictly after the stage completes,
    // certifies completeness.
    Seq((50L, "half", "p1")).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part")
      .parquet(s"$dir/_merge_staging")
    assert(new File(s"$dir/_merge_staging/_SUCCESS").exists())
    val before = rows()
    Layout.recoverMerge(spark, dir, "part")
    assert(rows() == before, "partial staging mutated the table")
    assert(!new File(s"$dir/_merge_staging").exists())
  }

  test("merge type guard: lossy updates types rejected; lossless widening lands in the table's partition names") {
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_types_${spark.sparkContext.applicationId}"
    // table: k long, v string, part INT
    Seq((1L, "a", 5), (2L, "b", 6)).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    // DOUBLE partCol vs INT table — the ADVICE r16 scenario: unionByName
    // would widen and stage part=5.0 next to part=5. Must reject.
    val lossy = Seq((1L, "a2", 5.0)).toDF("k", "v", "part")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeIntoPartitioned(spark, dir, lossy, "k", "part")
    }
    assert(e.getMessage.contains("losslessly"), e.getMessage)
    assert(spark.read.parquet(dir).where(col("v") === "a2").count() == 0,
      "rejected merge mutated the table")
    // INT updates into the INT table via an INT-typed frame, with the
    // KEY arriving narrower (int k vs long table k): lossless upcast —
    // allowed, and the delete-diff sees one consistent partition name
    val ok = Seq((1, "a2", 5, false), (2, "b", 6, true))
      .toDF("k", "v", "part", "_del")
    Layout.mergeIntoPartitioned(spark, dir, ok, "k", "part",
      deleteCol = Some("_del"))
    val got = spark.read.parquet(dir).select(col("k"), col("v"), col("part"))
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a2", 5)), s"widened merge wrong: $got")
    assert(!new File(s"$dir/part=6").exists(),
      "emptied partition survived a type-widened delete merge")
  }

  test("merge deletes escaped partition dirs correctly when emptied") {
    // Hive path escaping: a partition value with a ':' lands in an
    // escaped dir (part=a%3Ab); a delete-merge that empties it must
    // drop THAT dir, not the raw-name path
    val tmp = System.getProperty("java.io.tmpdir")
    val dir = s"$tmp/graft_spec_merge_esc_${spark.sparkContext.applicationId}"
    Seq((1L, "x", "a:b"), (2L, "y", "plain")).toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    assert(new File(s"$dir/part=a%3Ab").exists(), "fixture assumption: escaped dir")
    Layout.mergeIntoPartitioned(spark, dir,
      Seq((1L, "x", "a:b", true)).toDF("k", "v", "part", "_deleted"),
      "k", "part", deleteCol = Some("_deleted"))
    assert(!new File(s"$dir/part=a%3Ab").exists(),
      "emptied escaped partition kept its files")
    val got = spark.read.parquet(dir).select(col("k"), col("v"), col("part"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((2L, "y", "plain")))
  }
}
