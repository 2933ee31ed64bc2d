package graft.fhir

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FhirSearchSpec extends SparkSpec {

  private lazy val eng = FhirSearch.overFixtures(spark, "/root/repo/fixtures/fhir")

  test("string :exact is case-sensitive full match; default prefix is case-insensitive") {
    assert(eng.search("Patient?name:exact=Family007").count() == 1)
    assert(eng.search("Patient?name:exact=family007").count() == 0)
    assert(eng.search("Patient?name=fAmIlY00").count() == 9) // 001..009
  }

  test("token search: bare code and system| forms") {
    val bare = eng.search("Encounter?class=AMB").count()
    val sys = eng.search(
      "Encounter?class=http://terminology.hl7.org/CodeSystem/v3-ActCode|").count()
    assert(bare > 0 && sys >= bare)
  }

  test("paging is a disjoint total-order partition of the result set") {
    val p1 = eng.search("Patient?_sort=birthdate&_count=25&_page=1").select("id")
    val p2 = eng.search("Patient?_sort=birthdate&_count=25&_page=2").select("id")
    assert(p1.count() == 25 && p2.count() == 15)
    assert(p1.intersect(p2).count() == 0)
  }

  test("_total matches count of unrestricted search") {
    val total = eng.search("Patient?gender=male&_total=accurate&_count=0")
      .head().getLong(0)
    assert(total == eng.search("Patient?gender=male").count())
  }

  test("unknown type and unknown param raise") {
    intercept[RuntimeException](eng.search("Device?status=active"))
    intercept[RuntimeException](eng.search("Patient?nosuchparam=1"))
  }

  test("_history/vread: versioned reads over the append-only feed") {
    // newest-first ordering and _count truncation
    val hist = eng.search("Patient/p-010/_history")
      .select(col("meta.versionId")).collect().map(_.getString(0))
    assert(hist.toSeq == Seq("3", "2", "1"))
    assert(eng.search("Patient/p-010/_history?_count=2").count() == 2)
    // _since excludes the year-rebased superseded versions
    assert(eng.search(
      "Patient/p-010/_history?_since=2024-01-01T00:00:00Z").count() == 1)
    // vread pins the version-specific content
    assert(eng.search("Patient/p-010/_history/1")
      .select(col("name")(0).getField("family")).head().getString(0)
      == "Family010-v1")
    // single-version patients have exactly one history entry
    assert(eng.search("Patient/p-001/_history").count() == 1)
    // Observation serves a feed too (round 10, for system-level
    // _history): version-specific content is visible through vread
    assert(eng.search("Observation/obs-010/_history/1")
      .select(col("status")).head().getString(0) == "preliminary")
    // no feed for this type → loud error, not empty
    intercept[RuntimeException](eng.search("Specimen/sp-001/_history"))
  }

  test("currentFromHistory last-wins view reproduces the Patient table") {
    val current = FhirSearch.currentFromHistory(
      FhirIO.readNdjsonCached(spark,
        "/root/repo/fixtures/fhir/Patient.history.ndjson",
        FhirSchemas.patient))
    val patients = FhirIO.readNdjsonCached(spark,
      "/root/repo/fixtures/fhir/Patient.ndjson", FhirSchemas.patient)
    assert(current.count() == patients.count())
    // compare on the version-mutated fields: id → family must agree
    val a = current.select(col("id"),
      col("name")(0).getField("family").as("f"))
    val b = patients.select(col("id"),
      col("name")(0).getField("family").as("f"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("token :below/:above walk the CodeSystem subsumption hierarchy") {
    // 73211009 (Diabetes mellitus) is never coded directly — only its
    // child 44054006 — so the closure is doing the work, not self-match
    assert(eng.search(
      "Condition?code=http://snomed.info/sct|73211009").count() == 0)
    val below = eng.search(
      "Condition?code:below=http://snomed.info/sct|73211009").count()
    val self = eng.search(
      "Condition?code=http://snomed.info/sct|44054006").count()
    assert(below == self && below > 0, s"below=$below self=$self")
    // root :below sweeps every hierarchy-coded condition (all 3 fixture
    // codes descend from 64572001 Disease)
    assert(eng.search(
      "Condition?code:below=http://snomed.info/sct|64572001").count() ==
      eng.search("Condition").count())
    // :above of a leaf = ancestors-or-self; no ancestor is coded directly
    assert(eng.search(
      "Condition?code:above=http://snomed.info/sct|44054006").count() == self)
    // hierarchy modifiers demand system|code and a known CodeSystem
    intercept[RuntimeException](eng.search("Condition?code:below=44054006"))
    intercept[RuntimeException](eng.search(
      "Condition?code:below=http://example.org/unknown|1"))
  }

  test("valueless param raises a descriptive error, not a MatchError") {
    val e = intercept[IllegalArgumentException](eng.search("Patient?gender"))
    assert(e.getMessage.contains("gender"))
    // stray '&' is tolerated
    assert(eng.search("Patient?gender=male&").count() ==
      eng.search("Patient?gender=male").count())
  }

  test("_summary=text keeps only the narrative skeleton; =data drops the narrative") {
    val text = eng.search("Patient?_summary=text")
    assert(text.columns.toSeq == Seq("id", "meta", "text"))
    val data = eng.search("Patient?_summary=data")
    assert(!data.columns.contains("text") && data.columns.contains("gender"))
    // a type with no narrative rejects =text but serves =data
    intercept[IllegalArgumentException](eng.search("Specimen?_summary=text"))
    assert(eng.search("Specimen?_summary=data").count() > 0)
  }

  test("_include=* equals the explicit union of the type's reference params") {
    val wild = eng.search("Observation?status=final&_include=*")
    val explicit = eng.search("Observation?status=final" +
      "&_include=Observation:subject&_include=Observation:encounter")
    assert(wild.exceptAll(explicit).count() == 0 &&
      explicit.exceptAll(wild).count() == 0)
    // a type with no reference params degenerates to just the matches
    val pw = eng.search("Patient?gender=male&_include=*")
    assert(pw.filter(col("mode") =!= "match").count() == 0 && pw.count() > 0)
  }

  test("_revinclude=* pulls referencing rows across every serving type") {
    val wild = eng.search("Patient?gender=female&_revinclude=*").cache()
    // strictly more than any single-param revinclude, and multi-type
    val one = eng.search("Patient?gender=female&_revinclude=ResearchSubject:subject")
    assert(wild.count() > one.count())
    assert(one.exceptAll(wild).count() == 0) // superset of the explicit leg
    val types = wild.filter(col("mode") === "revinclude")
      .select("resourceType").distinct().collect().map(_.getString(0)).toSet
    assert(Set("Specimen", "Observation", "Group").subsetOf(types))
  }

  test("system-level search unions typed legs; shared meta params filter each") {
    val df = eng.search("?_type=Patient,Specimen&_lastUpdated=ge2024-06")
    assert(df.columns.toSeq == Seq("resourceType", "id"))
    val byType = df.groupBy("resourceType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("Patient", "Specimen"))
    assert(byType("Patient") ==
      eng.search("Patient?_lastUpdated=ge2024-06").count())
    assert(byType("Specimen") ==
      eng.search("Specimen?_lastUpdated=ge2024-06").count())
    // _type is mandatory; unknown leg types raise
    intercept[IllegalArgumentException](eng.search("?_lastUpdated=ge2024-06"))
    intercept[RuntimeException](eng.search("?_type=Patient,Device"))
  }

  test("quantity param: prefixes and bare-number equality") {
    val gt = eng.search("Observation?value-quantity=gt100").count()
    val le = eng.search("Observation?value-quantity=le100").count()
    val missing = eng.search("Observation?value-quantity:missing=true").count()
    assert(gt + le + missing == eng.search("Observation?_total=accurate").head().getLong(0))
    // bare number = exact equality on the double value
    val one = eng.search("Observation?value-quantity=47.1")
    assert(one.count() >= 1)
  }

  test("composite equals the conjunction of its components on singleton elements") {
    val composite = eng.search(
      "Observation?code-value-quantity=http://loinc.org|2339-0$gt60").select("id")
    val conj = eng.search(
      "Observation?code=http://loinc.org|2339-0&value-quantity=gt60").select("id")
    assert(composite.exceptAll(conj).count() == 0 &&
      conj.exceptAll(composite).count() == 0)
  }

  test("token :text is a case-insensitive prefix over concept text/display") {
    assert(eng.search("Condition?code:text=HYPERTEN").count() ==
      eng.search("Condition?code:text=hyperten").count())
    assert(eng.search("Condition?code:text=zzz").count() == 0)
  }

  test("multi-target chain requires a type qualifier; qualified chain joins") {
    intercept[RuntimeException](eng.search("Observation?subject.gender=female"))
    val typed = eng.search("Observation?subject:Patient.gender=female")
    assert(typed.count() > 0)
  }

  test("comma value-OR equals the union; repeated params stay a conjunction") {
    val or = eng.search("Patient?gender=male,female").select("id")
    val union = eng.search("Patient?gender=male").select("id")
      .unionByName(eng.search("Patient?gender=female").select("id"))
    assert(or.exceptAll(union).count() == 0 && union.exceptAll(or).count() == 0)
    // same param repeated = AND (the date-range idiom)
    assert(eng.search("Patient?gender=male&gender=female").count() == 0)
  }

  test("_summary=true projects the summary element set; _summary=count counts") {
    val s = eng.search("Patient?_summary=true")
    assert(s.columns.toSeq == Seq("id", "gender", "birthDate", "active"))
    assert(eng.search("Observation?_summary=count").head().getLong(0) == 60)
    assert(eng.search("ServiceRequest?_summary=true").columns.toSeq ==
      Seq("id", "status", "intent"))
  }

  test("$everything returns the patient plus every compartment resource, all as matches") {
    val rows = eng.search("Patient/p-001/$everything").collect()
    assert(rows.forall(_.getString(2) == "match"))
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byType("Patient") == 1)
    // per-type counts equal the equivalent compartment searches
    FhirSearch.EverythingTypes.foreach { t =>
      assert(byType.getOrElse(t, 0) == eng.search(s"Patient/p-001/$t").count(),
        s"type $t")
    }
  }

  test("$everything _type restricts child types but keeps the patient; _since filters on meta") {
    val typed = eng.search("Patient/p-001/$everything?_type=Observation").collect()
    assert(typed.map(_.getString(0)).toSet == Set("Patient", "Observation"))
    // _since later than every fixture update → only the types WITHOUT
    // server meta survive: they cannot honor the floor and sweep whole
    // (the export `since_applied` semantics — FhirSearch.MetaTypes is
    // the filterable set); restricting _type to meta-carrying types
    // gives the strict-incremental empty result
    // r19: ImagingStudy/MedicationAdministration joined MetaTypes, so the
    // only survivor is BodyStructure (no server meta on the raw R5 rows;
    // ServiceRequest also lacks meta but has no p-001 compartment row)
    val late = eng.search("Patient/p-001/$everything?_since=2030-01")
      .collect().map(_.getString(0)).toSet
    assert(late == Set("BodyStructure"),
      s"unexpected late-_since sweep: $late")
    assert(eng.search("Patient/p-001/$everything" +
      "?_since=2030-01&_type=Observation,Specimen").count() == 0)
    // _since before everything → identical to the unfiltered sweep
    assert(eng.search("Patient/p-001/$everything?_since=2000-01").count() ==
      eng.search("Patient/p-001/$everything").count())
  }

  test("$everything of an unknown id is empty; chain target is not hint-broadcast") {
    assert(eng.search("Patient/nope/$everything").count() == 0)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val chained = eng.search("ResearchSubject?subject.gender=female")
    val hints = chained.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, "chain target must not be force-broadcast: " +
      "its selectivity is unknowable at plan time (AQE decides at runtime)")
  }

  test("include/iterate dedupe keeps 'match' over 'revinclude' on an explicit rank") {
    // synthetic self-referencing graph: sp-2.subject -> Specimen/sp-1, so a
    // search matching BOTH with _revinclude=Specimen:subject reaches sp-2
    // as a match AND a revinclude target; lexicographic max(mode) would
    // demote it to 'revinclude'
    import spark.implicits._
    val specimen = Seq(("sp-1", "Patient/p-9"), ("sp-2", "Specimen/sp-1"))
      .toDF("id", "ref")
      .select(col("id"), struct(col("ref").as("reference")).as("subject"))
    val eng2 = new FhirSearch(spark, Map("Specimen" -> specimen))
    val rows = eng2.search(
      "Specimen?_id=sp-1,sp-2&_revinclude=Specimen:subject" +
        "&_include:iterate=Specimen:subject")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(rows(("Specimen", "sp-1")) == "match")
    assert(rows(("Specimen", "sp-2")) == "match") // the demotion bug case
    assert(rows(("Patient", "p-9")) == "include") // reached only via iterate
  }

  test("_revinclude:iterate reaches referencing resources transitively, once each") {
    // Patient p-001 ← Specimen.subject ← Group.member: the Group is only
    // reachable through the revincluded Specimen frontier, never directly
    val rows = eng.search(
      "Patient?_id=p-001&_revinclude=Specimen:subject" +
        "&_revinclude:iterate=Group:member").collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
    assert(byKey.length == byKey.toMap.size, "duplicate (type,id) rows")
    val m = byKey.toMap
    assert(m(("Patient", "p-001")) == "match")
    assert(m(("Specimen", "sp-001")) == "revinclude")
    assert(m(("Group", "g-01")) == "revinclude") // two reverse hops
    // a group whose members are all unrelated specimens must stay out
    assert(!m.contains(("Group", "g-02")))
  }

  test("_revinclude matches the full Type/id reference, not the bare id") {
    import spark.implicits._
    val patient = Seq("p-9").toDF("id")
    val specimen = Seq(("sp-1", "Patient/p-9"), ("sp-2", "Group/p-9"))
      .toDF("id", "ref")
      .select(col("id"), struct(col("ref").as("reference")).as("subject"))
    val eng2 = new FhirSearch(spark, Map("Patient" -> patient, "Specimen" -> specimen))
    val got = eng2.search("Patient?_id=p-9&_revinclude=Specimen:subject")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // sp-2 references Group/p-9 — same bare id, different type: excluded
    assert(got == Set(("Patient", "p-9"), ("Specimen", "sp-1")))
  }

  test("_text strips narrative markup before matching and ANDs with other params") {
    // fixture narratives embed the condition inside <p>…</p> tags; a
    // narrative word must match, a tag/attribute name must NOT
    val all = eng.search("Patient?_text=diabetes").count()
    assert(all > 0)
    val male = eng.search("Patient?_text=diabetes&gender=male").count()
    assert(male > 0 && male < all)
    // markup (tag names, attributes) is stripped — never matchable
    assert(eng.search("Patient?_text=xmlns").count() == 0)
    assert(eng.search("Patient?_text=nosuchcondition").count() == 0)
    // types without a narrative column reject _text with a clear error
    val e = intercept[IllegalArgumentException](eng.search("Specimen?_text=x"))
    assert(e.getMessage.contains("narrative"))
  }

  test("_content searches the serialized resource, beyond any declared param path") {
    // meta.tag.system has NO search param here — only whole-content
    // search can see it; every fixture Patient carries the tag system
    assert(eng.search("Patient?_content=example.org/tags").count() == 40)
    // id round-trips through the raw-line path: result is parsed rows
    val got = eng.search("Patient?_content=given021")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("p-021"))
    // without a raw source provider the param fails loudly, not silently
    import spark.implicits._
    val eng2 = new FhirSearch(spark, Map("Patient" -> Seq("p-1").toDF("id")))
    val err = intercept[RuntimeException](eng2.search("Patient?_content=x"))
    assert(err.getMessage.contains("raw-source"))
    // the 100 TB footgun guard: _content is a full raw-store scan by
    // definition, so over the configured byte cap it fails LOUDLY with
    // the knob named, instead of silently scanning everything
    spark.conf.set("graft.fhir.contentScanMaxBytes", "1")
    try {
      val big = intercept[RuntimeException](
        eng.search("Patient?_content=example.org/tags"))
      assert(big.getMessage.contains("contentScanMaxBytes"))
    } finally spark.conf.unset("graft.fhir.contentScanMaxBytes")
    // back under the default cap, the scan is admitted again
    assert(eng.search("Patient?_content=given021").count() == 1)
  }

  test("ServiceRequest: array-ref chain, based-on :missing, _has from Specimen") {
    // chain THROUGH the specimen array: ServiceRequests whose any
    // specimen belongs to p-001 — exploded equi-join, not array-contains
    val viaSpecimen = eng.search("ServiceRequest?specimen.subject=Patient/p-001")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(viaSpecimen == Seq("g-01")) // sp-001/sp-002 → p-001
    // based-on is LOAD-BEARING (r20): 7 planted follow-up links split
    // the type — :missing partitions it exactly, the ref filter excludes
    // the non-planted rows, the unqualified chain refuses (multi-target)
    val all = eng.search("ServiceRequest").count()
    assert(all == 23)
    assert(eng.search("ServiceRequest?based-on:missing=true").count() == 16)
    assert(eng.search("ServiceRequest?based-on:missing=false").count() == 7)
    assert(eng.search(
      "ServiceRequest?based-on=ServiceRequest/g-01").count() == 1)
    assert(eng.search("ServiceRequest?based-on=ServiceRequest/x").count() == 0)
    intercept[RuntimeException](
      eng.search("ServiceRequest?based-on.status=completed"))
    assert(eng.search("ServiceRequest?based-on:ServiceRequest" +
      ".subject=Patient/p-002").count() == 1) // g-03 <- g-01 (p-002's assay)
    // _has from Specimen through the scalar subject param still works
    assert(eng.search(
      "Patient?_has:ServiceRequest:subject:status=completed").count() > 0)
  }

  test("BodyStructure: location token rejects nothing valid; :missing splits the type") {
    val n = eng.search("BodyStructure").count()
    assert(n == 8)
    assert(eng.search("BodyStructure?location:missing=true").count() == n)
    val morph = eng.search("BodyStructure?morphology:missing=true").count()
    assert(morph == 2) // i % 4 == 0 rows carry no includedStructure
    assert(eng.search("BodyStructure?patient=Patient/p-003").count() == 1)
  }

  test("DocumentReference.related: the assay back-link (r20) — value-OR, " +
      ":missing, and the unqualified chain is an ambiguity error") {
    // 67 of 100 store docs were claimed by an assay (the golden's
    // ServiceRequest refs); value-OR unions two assays' documents
    val one = eng.search("DocumentReference?related=ServiceRequest/g-01").count()
    val two = eng.search(
      "DocumentReference?related=ServiceRequest/g-01,ServiceRequest/g-02").count()
    assert(one > 0 && two > one)
    // unclaimed docs carry no context at all in the rewritten store
    assert(eng.search("DocumentReference?related:missing=true").count()
      + eng.search("DocumentReference?related:missing=false").count() == 100)
    // related targets Any — unqualified chain must refuse, qualified runs
    intercept[RuntimeException](
      eng.search("DocumentReference?related.status=completed"))
    assert(eng.search(
      "DocumentReference?related:ServiceRequest.status=completed").count() > 0)
  }

  test("DocumentReference contenttype/date (r20): MIME token over any " +
      "attachment; date range composes; :missing semantics") {
    val typed = eng.search("DocumentReference?contenttype:missing=false").count()
    val untyped = eng.search("DocumentReference?contenttype:missing=true").count()
    assert(typed + untyped == 100 && typed > 0 && untyped > 0)
    // every date is backfilled deterministically — a full-year range is total
    assert(eng.search(
      "DocumentReference?date=ge2023-01-01&date=lt2024-01-01").count() == 100)
    assert(eng.search("DocumentReference?date=ge2023-04-01&date=lt2023-08-01")
      .count() < 100)
  }

  test("$expand/$lookup terminology operations (r20): edges and errors") {
    // unknown url is an error, not an empty expansion
    intercept[RuntimeException](
      eng.search("ValueSet/$expand?url=http://example.org/nope"))
    intercept[RuntimeException](eng.search("ValueSet/$expand?x=1"))
    // is-a include: self + both descendants + the explicit local concept
    val isa = eng.search("ValueSet/$expand?url=" +
      "http://example.org/fhir/ValueSet/diabetes-isa").collect()
    assert(isa.length == 4)
    assert(isa.map(_.getString(1)).toSet ==
      Set("73211009", "44054006", "46635009", "dm-x"))
    // lookup: display + parent + sorted children; unknown code = 0 rows;
    // unknown system errors
    val lk = eng.search("CodeSystem/$lookup?" +
      "system=http://snomed.info/sct&code=73211009").head()
    assert(lk.getString(2) == "Diabetes mellitus")
    assert(lk.getString(3) == "64572001")
    assert(lk.getSeq[String](4) == Seq("44054006", "46635009"))
    assert(eng.search("CodeSystem/$lookup?" +
      "system=http://snomed.info/sct&code=zzz").count() == 0)
    intercept[RuntimeException](eng.search(
      "CodeSystem/$lookup?system=http://example.org/nope&code=1"))
  }

  test("DocumentReference history: vread surfaces the superseded status") {
    assert(eng.search("DocumentReference/doc-010/_history").count() == 3)
    assert(eng.search("DocumentReference/doc-010/_history/1")
      .select("status").head().getString(0) == "superseded")
    assert(eng.search("DocumentReference/doc-001/_history").count() == 1)
  }

  test("export _typeFilter rejects result-modifying control params " +
      "(bulk-data spec: search parameters only)") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_export_ctl_${spark.sparkContext.applicationId}"
    // every control param that would corrupt the export silently —
    // _count truncates (and the read-back manifest would CERTIFY the
    // truncation), _elements projects, _total/_include/_revinclude
    // change the row shape under the OR-of-filters union
    Seq("Patient?gender=female&_count=10",
        "Patient?_elements=id",
        "Patient?gender=female&_total=accurate",
        "Patient?gender=female&_include=Patient:organization",
        "Patient?gender=female&_revinclude=Specimen:subject",
        "Patient?_sort=name&gender=female",
        "Patient?_summary=true",
        "Patient?_page=2&gender=female").foreach { f =>
      val e = intercept[IllegalArgumentException](
        eng.export(out, types = Some(Seq("Patient")), typeFilters = Seq(f)))
      assert(e.getMessage.contains("control parameter"), s"$f: ${e.getMessage}")
    }
    // underscore SEARCH params stay legal in filters
    val m = eng.export(out, types = Some(Seq("Patient")),
      typeFilters = Seq("Patient?_id=p-021")).collect()
    assert(m.length == 1 && m.head.getLong(1) == 1L)
  }
}
