package graft.fhir

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.CommittedAppend

/** Update-create ingest (the write half of the store contract,
  * reference README.md:29 --enable-update-create): version assignment,
  * exactly-once under replay, and crash-window convergence.
  */
class FhirStoreSpec extends SparkSpec {

  private val fix = "/root/repo/fixtures/fhir"
  private val stamp = "2025-01-15T00:00:00Z"

  private def freshFeed(tag: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_store_spec_${tag}_${spark.sparkContext.applicationId}"
    graft.util.TempFixtures.deleteOnExit(dir)
    FhirIO.readNdjson(spark, s"$fix/Patient.history.ndjson", FhirSchemas.patient)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def batch() =
    FhirIO.readNdjson(spark, s"$fix/Patient.ingest.ndjson", FhirSchemas.patient)

  test("version assignment: updates bump the true max, creates start at 1") {
    val feed = freshFeed("vassign")
    assert(FhirStore.updateCreate(spark, feed, batch(), 1L, stamp))
    val v = FhirStore.versions(spark, feed).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // p-010 carried versions 1..3 in the fixture — the bump lands on 4
    assert(v("p-010") == 4)
    assert(v("p-001") == 2)
    // creates: brand-new ids start at version 1
    assert(v("p-101") == 1 && v("p-102") == 1 && v("p-103") == 1)
    // untouched feed ids keep their fixture max
    assert(v("p-030") == 3)
    // the snapshot serves the revised content at the new version
    val snap = FhirStore.snapshot(spark, feed)
      .filter(col("id") === "p-001")
      .select(col("name")(0).getField("family"),
        col("meta.versionId"), col("meta.lastUpdated"))
      .head()
    assert(snap.getString(0) == "Family001Rev")
    assert(snap.getString(1) == "2" && snap.getString(2) == stamp)
  }

  test("exactly-once: replay no-ops and the snapshot is byte-stable") {
    val feed = freshFeed("replay")
    assert(FhirStore.updateCreate(spark, feed, batch(), 7L, stamp))
    val once = FhirStore.snapshot(spark, feed).orderBy("id").collect()
    assert(!FhirStore.updateCreate(spark, feed, batch(), 7L, stamp))
    assert(!FhirStore.updateCreate(spark, feed, batch(), 7L, stamp))
    val thrice = FhirStore.snapshot(spark, feed).orderBy("id").collect()
    assert(once.sameElements(thrice))
  }

  test("crash after promotion, before marker: retry converges on exactly " +
      "one copy of each version row") {
    val feed = freshFeed("crash")
    assert(FhirStore.updateCreate(spark, feed, batch(), 3L, stamp))
    val expected = FhirStore.snapshot(spark, feed).orderBy("id").collect()
    val nRows = spark.read.parquet(feed).count()
    // simulate the crash window: promotion completed (files live,
    // fingerprint recorded) but the _committed marker never landed
    val fs = new Path(feed).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(s"$feed/_committed/batch-3"), false))
    // the retry must re-stage IDENTICAL rows (feedWithout excludes the
    // batch's own promoted files from the prior-version map — otherwise
    // versions would bump twice and the determinism fingerprint would
    // park the batch), skip the existing promoted names, and commit
    assert(FhirStore.updateCreate(spark, feed, batch(), 3L, stamp))
    assert(spark.read.parquet(feed).count() == nRows)
    assert(FhirStore.snapshot(spark, feed).orderBy("id").collect()
      .sameElements(expected))
  }

  test("two sequential batches: the second bumps on top of the first") {
    val feed = freshFeed("twobatch")
    assert(FhirStore.updateCreate(spark, feed, batch(), 1L, stamp))
    assert(FhirStore.updateCreate(spark, feed, batch(), 2L,
      "2025-02-01T00:00:00Z"))
    val v = FhirStore.versions(spark, feed).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v("p-010") == 5 && v("p-001") == 3 && v("p-101") == 2)
    // history is append-only: every prior version is still served
    val p10 = spark.read.parquet(feed).filter(col("id") === "p-010")
    assert(p10.count() == 5)
  }

  test("a batch with duplicate ids is refused loudly (versions are " +
      "assigned per batch)") {
    val feed = freshFeed("dupids")
    val doubled = batch().unionByName(batch().limit(2))
    val e = intercept[IllegalArgumentException](
      FhirStore.updateCreate(spark, feed, doubled, 11L, stamp))
    assert(e.getMessage.contains("duplicate ids"))
    // nothing landed: the guard fires before any staging
    assert(spark.read.parquet(feed).count() ==
      FhirIO.readNdjson(spark, s"$fix/Patient.history.ndjson",
        FhirSchemas.patient).count())
  }

  test("ingest respects the maintenance fence (shared CommittedAppend " +
      "lifecycle)") {
    val feed = freshFeed("fence")
    val fs = new Path(feed).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = CommittedAppend.raiseFence(fs, feed)
    val e = intercept[IllegalStateException](
      FhirStore.updateCreate(spark, feed, batch(), 9L, stamp))
    assert(e.getMessage.contains("fence"))
    CommittedAppend.dropFenceOwned(fs, feed, token)
    assert(FhirStore.updateCreate(spark, feed, batch(), 9L, stamp))
  }
}
