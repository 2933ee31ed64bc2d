package graft.fhir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** FULL-OUTPUT golden test: every transformer's complete output frame must
  * equal the reference algorithm's output (tools/ref_mimic_transform.py —
  * a verbatim re-implementation of transform.py:11-129 — pinned under
  * fixtures/fhir/expected_r4/). Both sides are read with the engine
  * schema, so the comparison is structural (field-for-field), not
  * textual — key order and null-vs-absent don't matter, values do.
  */
class TransformGoldenSpec extends SparkSpec {

  private val fix = "/root/repo/fixtures/fhir"

  private def check(name: String, schema: StructType,
      transform: DataFrame => DataFrame, outSchema: StructType = null): Unit = {
    val readBack = Option(outSchema).getOrElse(schema)
    val out = transform(FhirIO.readNdjson(spark, s"$fix/$name.ndjson", schema))
    // round-trip the engine output through NDJSON so null-field omission
    // applies, then compare against the expected NDJSON under one schema
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_golden_$name"
    FhirIO.writeNdjson(out, tmp)
    val got = FhirIO.readNdjson(spark, tmp, readBack)
    val want = FhirIO.readNdjson(spark, s"$fix/expected_r4/$name.ndjson", readBack)
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$name: $extra unexpected rows, $missing missing rows")
    assert(got.count() == want.count())
  }

  test("A9 DocumentReference full output == reference algorithm") {
    check("DocumentReference", FhirSchemas.documentReference,
      Transformers.documentReference)
  }
  test("A10 BodyStructure full output == reference algorithm") {
    check("BodyStructure", FhirSchemas.bodyStructure, Transformers.bodyStructure)
  }
  test("A11 Encounter full output == reference algorithm") {
    check("Encounter", FhirSchemas.encounter, Transformers.encounter,
      FhirSchemas.encounterR4)
  }
  test("A12 Group full output == reference algorithm") {
    check("Group", FhirSchemas.group, Transformers.group)
  }
  test("A13 ImagingStudy full output == reference algorithm") {
    check("ImagingStudy", FhirSchemas.imagingStudy, Transformers.imagingStudy,
      FhirSchemas.imagingStudyR4)
  }
  test("A14 MedicationAdministration full output == reference algorithm") {
    check("MedicationAdministration", FhirSchemas.medicationAdministration,
      Transformers.medicationAdministration,
      FhirSchemas.medicationAdministrationR4)
  }
  test("A15 ResearchStudy full output == reference algorithm") {
    check("ResearchStudy", FhirSchemas.researchStudy, Transformers.researchStudy)
  }
  test("A16 ResearchSubject full output == reference algorithm") {
    check("ResearchSubject", FhirSchemas.researchSubject, Transformers.researchSubject)
  }
  test("A17 Specimen full output == reference algorithm") {
    check("Specimen", FhirSchemas.specimen, Transformers.specimen)
  }
}
