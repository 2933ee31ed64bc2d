package graft.fhir

import graft.SparkSpec

class TransformJobSpec extends SparkSpec {

  private val fix = "/root/repo/fixtures/fhir"
  private val tmp = System.getProperty("java.io.tmpdir")

  test("CLI-parity run: specimen file transforms end-to-end with stats") {
    val stats = TransformJob.run(spark, s"$fix/Specimen.ndjson",
      s"$tmp/graft_job_specimen", "Specimen")
    assert(stats == TransformJob.Stats(60, 60, 0))
  }

  test("continue mode diverts corrupt lines to a rejects sink") {
    val stats = TransformJob.run(spark, s"$fix/corrupt.ndjson",
      s"$tmp/graft_job_corrupt", "DocumentReference")
    assert(stats.corrupt == 3 && stats.read == 13)
    assert(spark.read.text(s"$tmp/graft_job_corrupt_rejects").count() == 3)
  }

  test("stop-on-first-error aborts on a corrupt file") {
    intercept[org.apache.spark.SparkException] {
      TransformJob.run(spark, s"$fix/corrupt.ndjson",
        s"$tmp/graft_job_ff", "DocumentReference", stopOnFirstError = true)
    }
  }

  test("unknown resourceType raises like dispatch_transformation") {
    intercept[IllegalArgumentException] {
      TransformJob.run(spark, s"$fix/Patient.ndjson", s"$tmp/x", "Observation")
    }
  }
}
