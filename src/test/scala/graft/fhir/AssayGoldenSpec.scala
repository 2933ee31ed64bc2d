package graft.fhir

import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** FULL-OUTPUT goldens for the assay pipeline's three sinks vs the
  * reference algorithm (tools/ref_mimic_assay.py, verbatim
  * reimplementation of assay.py, pinned under fixtures/fhir/expected_r4/).
  * Structural comparison under explicit schemas — every field of every
  * Assay, rewritten document, and surviving group must match.
  */
class AssayGoldenSpec extends SparkSpec {

  private val fix = "/root/repo/fixtures/fhir"

  private lazy val result = AssayPipeline.run(
    FhirIO.readNdjson(spark, s"$fix/DocumentReference.ndjson", FhirSchemas.documentReference),
    FhirIO.readNdjson(spark, s"$fix/Group.ndjson", FhirSchemas.group),
    FhirIO.readNdjson(spark, s"$fix/Specimen.ndjson", FhirSchemas.specimen))

  private def diff(got: org.apache.spark.sql.DataFrame, expectedFile: String,
      schema: StructType, sink: String): Unit = {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_assay_golden_$sink"
    FhirIO.writeNdjson(got, tmp)
    val g = FhirIO.readNdjson(spark, tmp, schema)
    val w = FhirIO.readNdjson(spark, s"$fix/expected_r4/$expectedFile", schema)
    val extra = g.exceptAll(w).count()
    val missing = w.exceptAll(g).count()
    assert(extra == 0 && missing == 0,
      s"$sink: $extra unexpected, $missing missing rows")
  }

  test("Assay sink: all 23 ServiceRequests field-for-field") {
    diff(result.assays, "Assay.ndjson", FhirSchemas.serviceRequest, "assays")
  }

  test("DocumentReference sink: all 100 docs (rewritten + untouched)") {
    diff(result.documents, "AssayDocumentReference.ndjson",
      FhirSchemas.documentReference, "documents")
  }

  test("Group sink: the 3 surviving groups verbatim") {
    diff(result.groups, "AssayGroup.ndjson", FhirSchemas.group, "groups")
  }
}
