package graft.fhir

import org.apache.spark.sql.types._

/** Explicit StructTypes for the FHIR resource subset the pipeline touches.
  *
  * One schema per resource type, covering the R5 *input* shape plus the R4
  * *output* fields the transformers add (e.g. `content[].format`,
  * `reasonReference`) — a single schema per type keeps the R5→R4 transform a
  * pure column rewrite with no schema surgery. Absent fields read as null and
  * are omitted again on NDJSON write (`ignoreNullFields`), which mirrors the
  * reference's dict semantics (fields present iff set).
  *
  * Field inventory derives from the operators in
  * /root/reference/scripts/transform.py:11-109 and assay.py:44-226; see
  * SURVEY.md §1.2 for the type mapping.
  */
object FhirSchemas {

  /** Coding {system, code, display} — SURVEY §1.2. */
  val coding: StructType = StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType)))

  /** CodeableConcept = {coding: [Coding], text}. */
  val codeableConcept: StructType = StructType(Seq(
    StructField("coding", ArrayType(coding)),
    StructField("text", StringType)))

  /** Reference = {reference: "Type/id", display?}. */
  val reference: StructType = StructType(Seq(
    StructField("reference", StringType),
    StructField("display", StringType)))

  /** Server-maintained metadata — the `_lastUpdated` (instant) and `_tag`
    * (token) search substrate, shared by every type that declares meta.
    * (Declared before the per-type schemas that embed it: object vals
    * initialize in declaration order.)
    */
  val resourceMeta: StructType = StructType(Seq(
    // server-assigned version (the _history/vread substrate); null in
    // the current-state fixtures, populated in *.history.ndjson feeds
    StructField("versionId", StringType),
    StructField("lastUpdated", StringType),
    StructField("tag", ArrayType(StructType(Seq(
      StructField("system", StringType),
      StructField("code", StringType))))),
    // security labels (the _security search substrate); null where a
    // fixture type carries no labels — same token shape as tag
    StructField("security", ArrayType(StructType(Seq(
      StructField("system", StringType),
      StructField("code", StringType))))),
    // asserted profile canonicals (the _profile uri-param substrate);
    // null where a fixture type asserts none
    StructField("profile", ArrayType(StringType))))

  val attachment: StructType = StructType(Seq(
    StructField("contentType", StringType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("size", LongType)))

  /** content[] element: R5 `profile` in, R4 `format` out (transform.py:14-17). */
  val docContent: StructType = StructType(Seq(
    StructField("attachment", attachment),
    StructField("profile", ArrayType(StructType(Seq(
      StructField("valueCoding", coding))))),
    StructField("format", coding)))

  val documentReference: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("version", StringType),
    StructField("status", StringType),
    StructField("subject", reference),
    StructField("content", ArrayType(docContent)),
    StructField("context", StructType(Seq(
      StructField("related", ArrayType(reference))))),
    StructField("basedOn", ArrayType(reference)),
    StructField("meta", resourceMeta)))

  /** The POST-ASSAY store view of DocumentReference (the rewritten docs
    * the assay pipeline PUTs back, assay.py:193-226) plus the server-side
    * `date` element (R4 `date` search param). The raw R5 input keeps
    * [[documentReference]] — the two states genuinely differ for this
    * type (tools/gen_docref_store.py).
    */
  val documentReferenceStore: StructType =
    StructType(documentReference.fields :+
      StructField("date", StringType))

  val bodyStructure: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("patient", reference),
    StructField("includedStructure", ArrayType(StructType(Seq(
      StructField("structure", codeableConcept))))),
    StructField("location", codeableConcept)))

  /** Encounter: R5 `class` is a CodeableConcept, R4 wants a Coding — the
    * output column type IS the Coding (transform.py:42-45). The R5 `reason`
    * gate and the top-level `reference` array feed `reasonReference`
    * (transform.py:40-41 — note the reference reads key "reference", not
    * "reason": a reference-code quirk preserved verbatim).
    */
  val encounter: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("class", codeableConcept),
    StructField("reason", ArrayType(StructType(Seq(
      StructField("use", ArrayType(codeableConcept)))))),
    StructField("reference", ArrayType(reference)),
    StructField("meta", resourceMeta)))

  val group: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("membership", StringType),
    StructField("type", StringType),
    StructField("actual", BooleanType),
    StructField("member", ArrayType(StructType(Seq(
      StructField("entity", reference))))),
    StructField("meta", resourceMeta)))

  /** ImagingStudy: R5 series[].modality CodeableConcept → R4 Coding.
    * `subject`/`started` serve the R4 search params (modality/subject/
    * started) — the transform passes them through untouched.
    */
  val imagingStudy: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("subject", reference),
    StructField("started", StringType),
    StructField("basedOn", ArrayType(reference)),
    StructField("procedureReference", ArrayType(reference)),
    StructField("series", ArrayType(StructType(Seq(
      StructField("uid", StringType),
      StructField("modality", codeableConcept))))),
    StructField("meta", resourceMeta)))

  val medicationAdministration: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("subject", reference),
    StructField("medication", StructType(Seq(
      StructField("concept", codeableConcept),
      StructField("reference", reference)))),
    StructField("medicationCodeableConcept", codeableConcept),
    StructField("medicationReference", reference),
    StructField("occurenceDateTime", StringType),
    StructField("effectiveDateTime", StringType),
    StructField("category", ArrayType(codeableConcept)),
    StructField("meta", resourceMeta)))

  val researchStudy: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("title", StringType),
    StructField("meta", resourceMeta)))

  val researchSubject: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("study", reference),
    StructField("subject", reference),
    StructField("individual", reference),
    StructField("meta", resourceMeta)))

  val specimen: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("subject", reference),
    StructField("processing", ArrayType(StructType(Seq(
      StructField("method", codeableConcept),
      StructField("procedure", codeableConcept))))),
    StructField("collection", StructType(Seq(
      StructField("procedure", reference),
      StructField("bodySite", codeableConcept)))),
    StructField("meta", resourceMeta)))

  /** Quantity {value, unit, system, code} — quantity search params. */
  val quantity: StructType = StructType(Seq(
    StructField("value", DoubleType),
    StructField("unit", StringType),
    StructField("system", StringType),
    StructField("code", StringType)))

  /** Pass-through analytical types: present in the reference's populated
    * store graph (docs/images/graph-view.png — Observation 24,911,
    * Procedure 1,616, Condition 537 resources) but untouched by
    * transform.py, so they carry no transformer — schema + search surface
    * only.
    */
  val observation: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("code", codeableConcept),
    StructField("subject", reference),
    StructField("effectiveDateTime", StringType),
    StructField("category", ArrayType(codeableConcept)),
    StructField("valueQuantity", quantity),
    StructField("encounter", reference),
    StructField("meta", resourceMeta)))

  val condition: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("clinicalStatus", codeableConcept),
    StructField("code", codeableConcept),
    StructField("subject", reference),
    StructField("onsetDateTime", StringType),
    StructField("recordedDate", StringType),
    StructField("meta", resourceMeta)))

  val procedure: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("code", codeableConcept),
    StructField("subject", reference),
    StructField("performedDateTime", StringType),
    StructField("encounter", reference),
    StructField("meta", resourceMeta)))

  val patient: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    // narrative (FHIR `text` element): the _text search substrate
    StructField("text", StructType(Seq(
      StructField("status", StringType),
      StructField("div", StringType)))),
    StructField("name", ArrayType(StructType(Seq(
      StructField("family", StringType),
      StructField("given", ArrayType(StringType)))))),
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("active", BooleanType),
    // business identifiers: the `identifier` token param substrate,
    // incl. the :of-type modifier (type.coding system|code + value)
    StructField("identifier", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("type", codeableConcept),
      StructField("system", StringType),
      StructField("value", StringType))))),
    StructField("meta", resourceMeta)))

  /** R4 OUTPUT shapes for the transformers that change a field's type
    * (not just presence): Encounter.class cc→Coding, ImagingStudy
    * series.modality cc→Coding, MedicationAdministration.category
    * array→scalar. Used to re-read transformed NDJSON (golden tests).
    */
  val encounterR4: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("class", coding),
    StructField("reason", ArrayType(StructType(Seq(
      StructField("use", ArrayType(codeableConcept)))))),
    StructField("reference", ArrayType(reference)),
    StructField("reasonReference", ArrayType(StringType))))

  val imagingStudyR4: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("procedureReference", ArrayType(reference)),
    StructField("series", ArrayType(StructType(Seq(
      StructField("uid", StringType),
      StructField("modality", coding)))))))

  val medicationAdministrationR4: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("subject", reference),
    StructField("medicationCodeableConcept", codeableConcept),
    StructField("medicationReference", reference),
    StructField("effectiveDateTime", StringType),
    StructField("category", codeableConcept)))

  /** ServiceRequest ("Assay") output shape — assay.py:156-191. The store
    * fixture IS the assay pipeline's output (the reference's linking model
    * exists so Patient ↔ Specimen ↔ ServiceRequest ↔ DocumentReference
    * traversals are queryable, scripts/README-assay.md:7-9). `basedOn` is
    * the R4 field the search param `based-on` serves; the assay output
    * never populates it, so it reads null (`:missing` semantics apply).
    */
  val serviceRequest: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("intent", StringType),
    StructField("category", ArrayType(codeableConcept)),
    StructField("code", codeableConcept),
    StructField("subject", reference),
    StructField("text", StructType(Seq(
      StructField("status", StringType),
      StructField("div", StringType)))),
    StructField("specimen", ArrayType(reference)),
    StructField("basedOn", ArrayType(reference))))

  /** Schema by resourceType — the dispatch table's type universe
    * (transform.py:112-129) plus Patient (search substrate).
    *
    * lazy: `valueSet` is declared below; object vals initialize in
    * declaration order, so an eager map here would capture null for it.
    */
  lazy val byType: Map[String, StructType] = Map(
    "DocumentReference" -> documentReference,
    "BodyStructure" -> bodyStructure,
    "Encounter" -> encounter,
    "Group" -> group,
    "ImagingStudy" -> imagingStudy,
    "MedicationAdministration" -> medicationAdministration,
    "ResearchStudy" -> researchStudy,
    "ResearchSubject" -> researchSubject,
    "Specimen" -> specimen,
    "ServiceRequest" -> serviceRequest,
    "Patient" -> patient,
    "Observation" -> observation,
    "Condition" -> condition,
    "Procedure" -> procedure,
    "ValueSet" -> valueSet,
    "CodeSystem" -> codeSystem)

  /** ValueSet — the terminology dimension behind token :in/:not-in
    * (compose.include is the portion the expansion walks).
    */
  val valueSet: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("status", StringType),
    StructField("compose", StructType(Seq(
      StructField("include", ArrayType(StructType(Seq(
        StructField("system", StringType),
        StructField("concept", ArrayType(StructType(Seq(
          StructField("code", StringType),
          StructField("display", StringType))))),
        // intensional include: is-a filters expand through the
        // CodeSystem hierarchy at plan time ($expand / :in)
        StructField("filter", ArrayType(StructType(Seq(
          StructField("property", StringType),
          StructField("op", StringType),
          StructField("value", StringType))))))))))))))

  /** CodeSystem — the terminology hierarchy behind token :below/:above
    * subsumption. FHIR nests child concepts under `concept`; a static
    * schema must bound the depth, and three levels covers the committed
    * fragment (the expansion walks whatever depth the schema exposes).
    */
  private val csLeaf = StructType(Seq(
    StructField("code", StringType),
    StructField("display", StringType)))

  private def csNode(child: StructType): StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("display", StringType),
    StructField("concept", ArrayType(child))))

  val codeSystem: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("status", StringType),
    StructField("content", StringType),
    StructField("hierarchyMeaning", StringType),
    StructField("concept", ArrayType(csNode(csNode(csLeaf))))))
}
