package graft.fhir

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.SparkSpec

/** Golden/negative tests per transformer, from the branch inventory in
  * /root/reference/scripts/transform.py and the validator error corpus
  * (scripts/README-transform.md:9-31). Fixtures under fixtures/fhir.
  */
class TransformersSpec extends SparkSpec {

  private val fix = "/root/repo/fixtures/fhir"

  private def read(name: String, schema: StructType) =
    FhirIO.readNdjson(spark, s"$fix/$name.ndjson", schema)

  test("A9 DocumentReference: Specimen-subject rows dropped, profile→format, version gone") {
    val in = read("DocumentReference", FhirSchemas.documentReference)
    val out = Transformers.documentReference(in).cache()
    // 12 Specimen-subject docs must be dropped (substring test)
    assert(in.count() == 100 && out.count() == 88)
    assert(out.filter(col("subject.reference").contains("Specimen")).count() == 0)
    assert(out.filter(col("version").isNotNull).count() == 0)
    // format == old profile[0].valueCoding on every kept row, profile gone
    assert(!out.schema("content").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.contains("profile"))
    val r = out.filter(col("id") === "doc-001")
      .select(element_at(col("content"), 1).getField("format").getField("code"))
      .head().getString(0)
    assert(r == "FMT2")
    // second content element (no profile in input) keeps null format
    val extra = out.filter(col("id") === "doc-007")
      .select(element_at(col("content"), 2).getField("format")).head()
    assert(extra.isNullAt(0))
  }

  test("A11 Encounter: NONAC default, first-coding class, quirky reasonReference") {
    val out = Transformers.encounter(read("Encounter", FhirSchemas.encounter)).cache()
    assert(out.filter(col("status") =!= "finished").count() == 0)
    // class absent (e-03) → NONAC literal default
    val e3 = out.filter(col("id") === "e-03")
      .select(col("class.code"), col("class.display")).head()
    assert(e3 == Row("NONAC", "inpatient non-acute"))
    // class present → FIRST coding only
    val e1 = out.filter(col("id") === "e-01")
      .select(col("class.code"), col("class.display")).head()
    assert(e1 == Row("AMB", "ambulatory"))
    // reason present + top-level reference present (e-08) → refs extracted
    val e8 = out.filter(col("id") === "e-08")
      .select(col("reasonReference"), col("reference")).head()
    assert(e8.getSeq[String](0) == Seq("Condition/c-8", "Condition/c-108"))
    assert(e8.isNullAt(1)) // popped
    // reason present, no reference key (e-04) → empty list, not null
    val e4 = out.filter(col("id") === "e-04").select(col("reasonReference")).head()
    assert(e4.getSeq[String](0) == Seq())
    // reason absent (e-13) → NO reasonReference, top-level reference KEPT
    val e13 = out.filter(col("id") === "e-13")
      .select(col("reasonReference"), col("reference").getItem(0).getField("reference")).head()
    assert(e13.isNullAt(0) && e13.getString(1) == "Condition/c-13")
  }

  test("A12 Group / A15 ResearchStudy / A16 ResearchSubject constants") {
    val g = Transformers.group(read("Group", FhirSchemas.group))
    assert(g.filter(col("type") =!= "person" || !col("actual")
      || col("membership").isNotNull).count() == 0)
    val rs = Transformers.researchStudy(read("ResearchStudy", FhirSchemas.researchStudy))
    assert(rs.filter(col("name").isNotNull).count() == 0)
    val rsub = Transformers.researchSubject(
      read("ResearchSubject", FhirSchemas.researchSubject))
    assert(rsub.filter(col("status") =!= "on-study").count() == 0)
    assert(rsub.filter(col("individual.reference").isNull).count() == 0)
  }

  test("A13 ImagingStudy: space-stripped modality system (invalid-URI fix)") {
    val out = Transformers.imagingStudy(read("ImagingStudy", FhirSchemas.imagingStudy))
    val bad = out.select(explode(col("series")).as("s"))
      .filter(col("s.modality.system").contains(" "))
    assert(bad.count() == 0)
    val i2 = out.filter(col("id") === "i-02")
      .select(element_at(col("series"), 1).getField("modality").getField("system")).head()
    assert(i2.getString(0) == "http://dicom.nema.org/resources/ontology/DCM")
  }

  test("A14 MedicationAdministration: branch select + quote-strip on coding[0] only") {
    val out = Transformers.medicationAdministration(
      read("MedicationAdministration", FhirSchemas.medicationAdministration)).cache()
    val m1 = out.filter(col("id") === "m-01").select(
      col("medicationCodeableConcept.coding").getItem(0).getField("system"),
      col("medicationCodeableConcept.coding").getItem(1).getField("system"),
      col("effectiveDateTime"), col("medicationReference")).head()
    assert(m1.getString(0) == "https://cadsr.cancer.gov1")   // quotes stripped
    assert(m1.getString(1) == "https://untouched'kept'")     // coding[1] untouched
    assert(m1.getString(2) == "2020-02-01T00:00:00Z")
    assert(m1.isNullAt(3))
    val m3 = out.filter(col("id") === "m-03")
      .select(col("medicationReference.reference"), col("medicationCodeableConcept")).head()
    assert(m3.getString(0) == "Medication/med-3" && m3.isNullAt(1))
    // category scalarized (array<cc> → cc, first element kept)
    val m2 = out.filter(col("id") === "m-02")
      .select(col("category.coding").getItem(0).getField("code")).head()
    assert(m2.getString(0) == "cat-2")
  }

  test("A17 Specimen: method→procedure, collection.procedure removed from type") {
    val out = Transformers.specimen(read("Specimen", FhirSchemas.specimen))
    val collType = out.schema("collection").dataType.asInstanceOf[StructType]
    assert(!collType.fieldNames.contains("procedure"))
    val procType = out.schema("processing").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(procType.fieldNames.contains("procedure") && !procType.fieldNames.contains("method"))
    val sp2 = out.filter(col("id") === "sp-002")
      .select(element_at(col("processing"), 1).getField("procedure")
        .getField("coding").getItem(0).getField("code")).head()
    assert(sp2.getString(0) == "pm-2")
  }

  test("A8 dispatch: unknown types rejected, known types routed") {
    assert(Transformers.dispatch("Observation").isEmpty)
    assert(Transformers.dispatch("Specimen").isDefined)
    val mixed = spark.read.text(s"$fix/mixed.ndjson")
      .select(get_json_object(col("value"), "$.resourceType").as("resourceType"))
    val (branches, rejects) = Transformers.splitByType(mixed)
    assert(rejects.count() == 2)
    assert(branches("ResearchStudy").count() == 4)
  }

  test("A18/A19 reject channel: corrupt lines isolated, FAILFAST aborts") {
    val perm = FhirIO.readNdjsonPermissive(spark, s"$fix/corrupt.ndjson",
      FhirSchemas.documentReference).cache()
    assert(FhirIO.isCorrupt(perm).count() == 3)
    assert(FhirIO.isValid(perm).count() == 10)
    intercept[org.apache.spark.SparkException] {
      FhirIO.readNdjsonFailFast(spark, s"$fix/corrupt.ndjson",
        FhirSchemas.documentReference).count()
    }
  }
}
