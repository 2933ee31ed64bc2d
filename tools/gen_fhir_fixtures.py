#!/usr/bin/env python3
"""Deterministic FHIR R5 NDJSON fixture generator (seed-free: pure functions
of index). Emits fixtures/fhir/*.ndjson plus Python-pinned oracle vectors:

- uuid5_vectors.csv: uuid.uuid5(NAMESPACE_DNS, doc_id + '-assay') for every
  document that reaches assay pass-2 (Specimen subject) — the authoritative
  RFC-4122 v5 values the Spark expression must reproduce bit-exactly
  (reference: /root/reference/scripts/assay.py:100).
- mime_vectors.csv: expected contentType per doc computed with Python's
  mimetypes configured exactly like the reference (assay.py:11-20,123-140).

Run once; output is committed. Do not regenerate casually (uuid/mime vectors
are pinned into ScalaTests).
"""
import json
import mimetypes
import os
import urllib.parse
import uuid

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")

# Replicate the reference's custom mime registrations (assay.py:11-20)
mimetypes.add_type('text/x-r', '.R', strict=True)
mimetypes.add_type('text/x-r', '.r', strict=True)
mimetypes.add_type('text/tab-separated-values', '.maf', strict=True)
mimetypes.add_type('text/tab-separated-values', '.bed5', strict=True)
mimetypes.add_type('text/tab-separated-values', '.bed', strict=True)
mimetypes.add_type('text/tab-separated-values', '.vcf', strict=True)
mimetypes.add_type('text/tab-separated-values', '.sam', strict=True)
mimetypes.add_type('text/yaml', '.yaml', strict=True)
mimetypes.add_type('text/x-markdown', '.md', strict=True)
mimetypes.add_type('text/x-markdown', '.markdown', strict=True)


def meta(i, code_a, code_b, minute=15):
    """Server-maintained meta (the _lastUpdated/_tag search substrate) —
    deterministic per index, distinct tag vocabulary per caller."""
    return {
        "lastUpdated": f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                       f"T{i % 24:02d}:{minute:02d}:00Z",
        "tag": [{"system": "https://example.org/tags",
                 "code": code_a if i % 3 == 0 else code_b}],
    }


def w(name, rows):
    with open(os.path.join(OUT, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def patients():
    # deterministic narrative vocabulary: the _text (narrative search)
    # substrate — tag-stripped matching must see through the XHTML markup
    conditions = ["hypertension", "diabetes", "asthma"]
    for i in range(1, 41):
        cond = conditions[i % 3]
        yield {
            "resourceType": "Patient", "id": f"p-{i:03d}",
            "text": {
                "status": "generated",
                "div": (f'<div xmlns="http://www.w3.org/1999/xhtml">'
                        f'<p>Patient <b>Family{i:03d}</b>, '
                        f'{"active" if i % 5 else "inactive"} record.</p>'
                        f'<p>History of {cond}.</p></div>'),
            },
            "name": [{"family": f"Family{i:03d}", "given": [f"Given{i:03d}"]}],
            # business identifiers: `identifier` token-param substrate.
            # Every patient has an MR (medical-record) identifier; every
            # 3rd also a DL — so :of-type can discriminate by type code
            # where plain system|value cannot (the MRN/DL VALUES collide
            # on purpose for i % 12 == 0: same value, different type).
            "identifier": (
                [{"use": "official",
                  "type": {"coding": [{
                      "system": "http://terminology.hl7.org/CodeSystem/v2-0203",
                      "code": "MR"}],
                      "text": "Medical record number"},
                  "system": "http://hospital.example.org/mrn",
                  "value": f"ID-{i:05d}"}]
                + ([{"use": "official",
                     "type": {"coding": [{
                         "system": "http://terminology.hl7.org/CodeSystem/v2-0203",
                         "code": "DL"}]},
                     "system": "urn:oid:2.16.840.1.113883.4.3.25",
                     "value": (f"ID-{i:05d}" if i % 12 == 0 else f"DL-{i:04d}")}]
                   if i % 3 == 0 else [])),
            "gender": "female" if i % 2 == 0 else "male",
            "birthDate": f"{1950 + (i * 7) % 50}-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",
            "active": i % 5 != 0,
            # server-maintained meta: substrate for _lastUpdated (date
            # param on meta.lastUpdated) and _tag (token param on meta.tag)
            "meta": {
                "lastUpdated": f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                               f"T{i % 24:02d}:00:00Z",
                "tag": [{"system": "https://example.org/tags",
                         "code": "batch-a" if i % 3 == 0 else "batch-b"}],
                # security labels: the _security token-param substrate
                "security": [{
                    "system": "http://terminology.hl7.org/CodeSystem/v3-Confidentiality",
                    "code": "R" if i % 4 == 0 else "N"}],
                # asserted profiles: the _profile uri-param substrate —
                # every record asserts the core profile; every 5th also a
                # research profile (exact match + :below prefix coverage)
                "profile": (
                    ["http://example.org/fhir/StructureDefinition/core-patient"]
                    + (["http://example.org/fhir/StructureDefinition/research-patient"]
                       if i % 5 == 0 else [])),
            },
        }


def specimens():
    for i in range(1, 61):
        s = {
            "resourceType": "Specimen", "id": f"sp-{i:03d}",
            "subject": {"reference": f"Patient/p-{(i - 1) % 40 + 1:03d}"},
            "meta": meta(i, "frozen", "ffpe"),
        }
        if i % 2 == 0:
            s["processing"] = [
                {"method": {"coding": [{"system": "http://snomed.info/sct",
                                        "code": f"pm-{i}"}]}}]
        if i % 3 == 0:
            s["collection"] = {"procedure": {"reference": f"Procedure/pr-{i}"},
                               "bodySite": {"text": f"site-{i % 7}"}}
        elif i % 3 == 1:
            s["collection"] = {"bodySite": {"text": f"site-{i % 7}"}}
        yield s


# Groups: g-01..g-08 and g-12..g-14 are "claimed" (specimen member(s) whose
# specimen row exists → patient ref found); g-09/g-10/g-11 stay unclaimed.
def groups():
    def member(ref):
        return {"entity": {"reference": ref}}
    claimed = {
        "g-01": [member("Specimen/sp-001"), member("Specimen/sp-002")],
        "g-02": [member("Specimen/sp-003"), member("Specimen/sp-004"),
                 member("Specimen/sp-005")],
        # missing specimen contributes a ref but no patient (assay.py:66-69);
        # last-wins: patient comes from sp-006 even though sp-999 is later
        "g-03": [member("Specimen/sp-006"), member("Specimen/sp-999")],
        # member entity without a reference key is skipped (assay.py:64)
        "g-04": [{"entity": {"display": "no-ref"}}, member("Specimen/sp-007")],
        # Patient members ignored by the specimen scan (assay.py:65)
        "g-05": [member("Patient/p-001"), member("Specimen/sp-008"),
                 member("Specimen/sp-009")],
        "g-06": [member("Specimen/sp-010"), member("Specimen/sp-011"),
                 member("Specimen/sp-012"), member("Specimen/sp-013")],
        "g-07": [member("Specimen/sp-014")],
        "g-08": [member("Specimen/sp-015"), member("Specimen/sp-016")],
        "g-12": [member("Specimen/sp-017")],
        "g-13": [member("Specimen/sp-018"), member("Specimen/sp-019")],
        "g-14": [member("Specimen/sp-020")],
    }
    unclaimed = {
        "g-09": [member("Patient/p-002"), member("Patient/p-003")],
        # specimen refs present but none resolvable → no patient → skipped
        "g-10": [member("Specimen/sp-998")],
        "g-11": [member("Patient/p-004")],
    }
    for gi, gid in enumerate(sorted(list(claimed) + list(unclaimed)), 1):
        yield {
            "resourceType": "Group", "id": gid,
            "membership": "definitional", "type": "specimen",
            "member": claimed.get(gid) or unclaimed[gid],
            "meta": meta(gi, "cohort", "adhoc"),
        }


CLAIMED_GROUPS = ["g-01", "g-02", "g-03", "g-04", "g-05", "g-06", "g-07",
                  "g-08", "g-12", "g-13", "g-14"]
UNCLAIMED_GROUPS = ["g-09", "g-10", "g-11"]

# attachment variants: (title, url, size). Chosen so file_name is always
# resolvable (title set, or url path contains '.').
ATTACHMENTS = [
    ("sample.maf", "https://portal.example.org/files/sample.maf", 1234),
    ("counts.tsv", None, 220),
    (None, "https://x.org/data/run1/reads.bam", 987654),   # .bam → octet-stream
    ("notes.md", "https://x.org/page", 40),                # url path no dot → title
    ("script.R", None, 51),                                # exact-case custom type
    ("variants.vcf", "https://x.org/v/variants.vcf", 777),
    ("regions.bed", None, 88),
    ("model.yaml", None, 12),
    ("aligned.sam", "https://x.org/s/aligned.sam?x=1", 4242),
    ("readme.txt", None, 9),
    ("table.csv", "https://x.org/t/table.csv", 33),
    ("blob.xyz123", None, 5),                              # unguessable → octet-stream
    ("archive.json", None, 64),
    ("UPPER.MAF", None, 71),                               # lowercase fallback
    ("regions.bed5", None, 19),
    ("doc.markdown", None, 27),
]


def docs():
    """100 docs: 55 → claimed groups, 3 → unclaimed groups (one each),
    12 → Specimen subject (pass-2), 30 → Patient subject (untouched)."""
    n = 0

    def doc(subject_ref):
        nonlocal n
        n += 1
        title, url, size = ATTACHMENTS[(n - 1) % len(ATTACHMENTS)]
        att = {"size": size}
        if title:
            att["title"] = title
        if url:
            att["url"] = url
        content = [{
            "attachment": att,
            "profile": [{"valueCoding": {
                "system": "https://dcc.example.org/format",
                "code": f"FMT{(n % 5) + 1}"}}],
        }]
        # every 7th doc gets a second content element (no profile) so the
        # transform.py loop over content[] and the [0]-only assay delete
        # are distinguishable
        if n % 7 == 0:
            content.append({"attachment": {"title": f"extra-{n}.txt", "size": n}})
        d = {
            "resourceType": "DocumentReference", "id": f"doc-{n:03d}",
            "version": str((n % 3) + 1), "status": "current",
            "subject": {"reference": subject_ref},
            "content": content,
            "meta": meta(n, "ingest-a", "ingest-b"),
        }
        # some docs already carry a context.related to exercise the append
        # (assay.py:215-222) vs create path
        if n % 11 == 0:
            d["context"] = {"related": [{"reference": f"Encounter/e-{n:02d}"}]}
        return d

    out = []
    for i in range(55):  # docs into claimed groups (g-07 gets none)
        gid = [g for g in CLAIMED_GROUPS if g != "g-07"][i % 10]
        out.append(doc(f"Group/{gid}"))
    for gid in UNCLAIMED_GROUPS:  # exactly one doc per unclaimed group
        out.append(doc(f"Group/{gid}"))
    for i in range(12):  # pass-2 docs; specimen must exist (assay.py:97)
        out.append(doc(f"Specimen/sp-{21 + i:03d}"))
    for i in range(30):
        out.append(doc(f"Patient/p-{(i % 40) + 1:03d}"))
    return out


def encounters():
    for i in range(1, 13):
        e = {"resourceType": "Encounter", "id": f"e-{i:02d}", "status": "completed",
             "meta": meta(i, "ed-load", "clinic")}
        if i % 3 != 0:  # class present → first coding
            first = {"system": "http://terminology.hl7.org/CodeSystem/v3-ActCode",
                     "code": "AMB" if i % 2 else "IMP"}
            if i % 2:
                first["display"] = "ambulatory"
            e["class"] = {"coding": [first, {"system": "ignored", "code": "second"}]}
        if i % 4 == 0:  # reason gate present
            e["reason"] = [{"use": [{"coding": [{"code": f"r-{i}"}]}]}]
        if i % 8 == 0:  # top-level "reference" key: the quirk source
            e["reference"] = [{"reference": f"Condition/c-{i}"},
                              {"reference": f"Condition/c-{i + 100}"}]
        yield e
    # reference WITHOUT reason: the pop() is gated on reason, so this
    # top-level "reference" key survives the transform (transform.py:40-41)
    yield {"resourceType": "Encounter", "id": "e-13", "status": "planned",
           "class": {"coding": [{"system": "sys", "code": "VR"}]},
           "reference": [{"reference": "Condition/c-13"}],
           "meta": meta(13, "ed-load", "clinic")}


def bodystructures():
    for i in range(1, 9):
        b = {"resourceType": "BodyStructure", "id": f"b-{i:02d}",
             "patient": {"reference": f"Patient/p-{i:03d}"}}
        if i % 4 != 0:
            b["includedStructure"] = [
                {"structure": {"coding": [{"system": "http://snomed.info/sct",
                                           "code": f"3960700{i}"}]}},
                {"structure": {"coding": [{"code": "ignored"}]}},
            ][: 1 + (i % 2)]
        yield b


def imagingstudies():
    for i in range(1, 11):
        s = {"resourceType": "ImagingStudy", "id": f"i-{i:02d}", "status": "available"}
        if i % 2 == 0:
            s["basedOn"] = [{"reference": f"ServiceRequest/sr-{i}"}]
        series = []
        if i % 4 != 3:
            series.append({"uid": f"1.2.{i}.1", "modality": {"coding": [
                {"system": " http://dicom.nema.org/resources/ontology/DCM",
                 "code": "MR" if i % 2 else "CT"}]}})
        if i % 5 == 0:
            series.append({"uid": f"1.2.{i}.2"})  # series without modality
        if series:
            s["series"] = series
        yield s


def medadmins():
    for i in range(1, 13):
        m = {"resourceType": "MedicationAdministration", "id": f"m-{i:02d}",
             "status": "completed",
             "subject": {"reference": f"Patient/p-{i:03d}"},
             "occurenceDateTime": f"2020-{(i % 12) + 1:02d}-01T00:00:00Z"}
        if i % 3 == 0:  # reference branch
            m["medication"] = {"reference": {"reference": f"Medication/med-{i}"}}
        else:  # concept branch; quoted system exercises the strip
            m["medication"] = {"concept": {"coding": [
                {"system": f"https://cadsr.cancer.gov'{i}'", "code": f"c-{i}"},
                {"system": "https://untouched'kept'", "code": "second"}]}}
        if i % 2 == 0:
            m["category"] = [{"coding": [{"system": "s", "code": f"cat-{i}"}]},
                             {"coding": [{"code": "dropped"}]}]
        yield m


# Pass-through analytical types (present in the reference's populated store
# graph — docs/images/graph-view.png: Observation 24,911, Procedure 1,616,
# Condition 537 — but with no transform in transform.py): search substrate
# only. Shapes chosen to exercise token, date, reference, quantity,
# composite, and :text search params.

LOINC = [("718-7", "Hemoglobin"), ("2339-0", "Glucose"),
         ("2160-0", "Creatinine"), ("6690-2", "Leukocytes")]


def observations():
    for i in range(1, 61):
        code, display = LOINC[i % 4]
        o = {
            "resourceType": "Observation", "id": f"obs-{i:03d}",
            "status": "final" if i % 5 else "preliminary",
            "code": {"coding": [{"system": "http://loinc.org", "code": code,
                                 "display": display}],
                     "text": display.lower()},
            "subject": {"reference": f"Patient/p-{(i - 1) % 40 + 1:03d}"},
            "effectiveDateTime":
                f"{2020 + i % 3}-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}T08:00:00Z",
            "category": [{"coding": [
                {"system": "http://terminology.hl7.org/CodeSystem/observation-category",
                 "code": "laboratory" if i % 3 else "vital-signs"}]}],
            # server meta for _lastUpdated/_tag (same shape as Patient)
            "meta": {
                "lastUpdated": f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                               f"T{i % 24:02d}:30:00Z",
                "tag": [{"system": "https://example.org/tags",
                         "code": "lab-load" if i % 4 == 0 else "routine"}],
            },
        }
        if i % 7 != 0:  # some observations carry no value (:missing target)
            o["valueQuantity"] = {"value": round(10 + (i * 37) % 130 + i / 8, 1),
                                  "unit": "g/dL", "system": "http://unitsofmeasure.org",
                                  "code": "g/dL"}
        if i % 6 == 0:
            o["encounter"] = {"reference": f"Encounter/e-{(i % 12) + 1:02d}"}
        yield o


CONDITION_CODES = [("38341003", "hypertension"), ("44054006", "diabetes"),
                   ("195967001", "asthma")]


def conditions():
    for i in range(1, 21):
        code, text = CONDITION_CODES[i % 3]
        yield {
            "resourceType": "Condition", "id": f"cond-{i:03d}",
            "clinicalStatus": {"coding": [
                {"system": "http://terminology.hl7.org/CodeSystem/condition-clinical",
                 "code": "active" if i % 4 else "resolved"}]},
            "code": {"coding": [{"system": "http://snomed.info/sct", "code": code}],
                     "text": text},
            "subject": {"reference": f"Patient/p-{(i * 3 - 2) % 40 + 1:03d}"},
            "onsetDateTime": f"{2015 + i % 8}-{(i % 12) + 1:02d}-01",
            "recordedDate": f"{2019 + i % 5}-{(i % 12) + 1:02d}-15",
            "meta": meta(i, "problem-list", "claims"),
        }


def procedures():
    for i in range(1, 26):
        p = {
            "resourceType": "Procedure", "id": f"proc-{i:03d}",
            "status": "completed" if i % 5 else "in-progress",
            "code": {"coding": [{"system": "http://snomed.info/sct",
                                 "code": f"8015000{i % 4}"}],
                     "text": f"procedure-{i % 4}"},
            "subject": {"reference": f"Patient/p-{(i * 7 - 6) % 40 + 1:03d}"},
            "performedDateTime": f"{2018 + i % 6}-{(i % 12) + 1:02d}-10T12:00:00Z",
            "meta": meta(i, "or-log", "claims"),
        }
        if i % 4 == 0:
            p["encounter"] = {"reference": f"Encounter/e-{(i % 12) + 1:02d}"}
        yield p


def researchstudies():
    for i in range(1, 5):
        r = {"resourceType": "ResearchStudy", "id": f"rs-{i}",
             "status": "active", "title": f"Study {i}",
             "meta": meta(i, "registry", "manual")}
        if i % 2 == 0:
            r["name"] = f"STUDY-{i}"
        yield r


def researchsubjects():
    for i in range(1, 9):
        yield {"resourceType": "ResearchSubject", "id": f"rsub-{i}",
               "status": "active",
               "study": {"reference": f"ResearchStudy/rs-{(i % 4) + 1}"},
               "subject": {"reference": f"Patient/p-{i:03d}"},
               "meta": meta(i, "enrolled", "migrated")}


def mime_expected(d):
    att = d["content"][0]["attachment"]
    title, url = att.get("title"), att.get("url")
    file_name = title
    if url:
        path = urllib.parse.urlparse(url).path
        if "." in path:
            file_name = path
    (mt, _) = mimetypes.guess_type(file_name, strict=False)
    return mt or "application/octet-stream"


def main():
    os.makedirs(OUT, exist_ok=True)
    all_docs = docs()
    w("Patient.ndjson", patients())
    w("Specimen.ndjson", specimens())
    w("Group.ndjson", groups())
    w("DocumentReference.ndjson", all_docs)
    w("Encounter.ndjson", encounters())
    w("BodyStructure.ndjson", bodystructures())
    w("ImagingStudy.ndjson", imagingstudies())
    w("MedicationAdministration.ndjson", medadmins())
    w("ResearchStudy.ndjson", researchstudies())
    w("ResearchSubject.ndjson", researchsubjects())
    w("Observation.ndjson", observations())
    w("Condition.ndjson", conditions())
    w("Procedure.ndjson", procedures())

    # mixed-type stream incl. unknown types (dispatch reject channel)
    mixed = (list(researchstudies()) + list(researchsubjects())
             + list(bodystructures())
             + [{"resourceType": "Observation", "id": "obs-1", "status": "final"},
                {"resourceType": "Device", "id": "dev-1"}])
    w("mixed.ndjson", mixed)

    # corrupt stream: 10 good docs + 3 broken lines
    with open(os.path.join(OUT, "corrupt.ndjson"), "w") as f:
        for i, d in enumerate(all_docs[:10]):
            f.write(json.dumps(d) + "\n")
            if i in (2, 5, 8):
                f.write('{"resourceType": "DocumentReference", "id": broken\n')

    # pinned uuid5 vectors for pass-2 docs (+ generic test vectors)
    with open(os.path.join(OUT, "uuid5_vectors.csv"), "w") as f:
        f.write("name,uuid\n")
        for d in all_docs:
            if d["subject"]["reference"].startswith("Specimen/"):
                nm = d["id"] + "-assay"
                f.write(f"{nm},{uuid.uuid5(uuid.NAMESPACE_DNS, nm)}\n")
        for nm in ["", "a", "hello world", "doc-042-assay",
                   "üñïçødé-assay", "x" * 200]:
            f.write(f"{nm},{uuid.uuid5(uuid.NAMESPACE_DNS, nm)}\n")

    # pinned mime vectors for every doc
    with open(os.path.join(OUT, "mime_vectors.csv"), "w") as f:
        f.write("doc_id,content_type\n")
        for d in all_docs:
            f.write(f"{d['id']},{mime_expected(d)}\n")

    # extended mime vectors: encoding suffixes (.gz/.Z/.bz2/.xz/.br),
    # suffix_map (.tgz/.svgz), non-strict common_types (.rtf), and URL
    # shapes java.net.URI rejects (relative path, spaces) — the divergence
    # cases Python handles that doc fixtures never exercise
    extra = [
        ("sample.vcf.gz", None), ("calls.maf.gz", None),
        ("regions.bed.Z", None), ("notes.txt.bz2", None),
        ("data.tsv.xz", None), ("doc.md.br", None),
        ("archive.tgz", None), ("img.svgz", None), ("x.tar.gz", None),
        ("paper.rtf", None), ("UPPER.VCF.GZ", None),
        (None, "https://x.org/files/run.vcf.gz?x=1"),
        (None, "files/x.vcf"),
        (None, "https://x.org/a b/f.maf"),
        ("title.txt", "https://x.org/page"),
    ]
    with open(os.path.join(OUT, "mime_extra_vectors.csv"), "w") as f:
        f.write("title,url,content_type\n")
        for title, url in extra:
            file_name = title
            if url:
                path = urllib.parse.urlparse(url).path
                if "." in path:
                    file_name = path
            mt, _ = mimetypes.guess_type(file_name, strict=False)
            f.write(f"{title or ''},{url or ''},{mt or 'application/octet-stream'}\n")

    # print the ext → mime resolution actually used (for the Scala map)
    exts = set()
    for t, u, _ in ATTACHMENTS:
        fn = t
        if u:
            p = urllib.parse.urlparse(u).path
            if "." in p:
                fn = p
        exts.add(fn.rsplit(".", 1)[-1] if "." in fn else "")
    for e in sorted(exts):
        mt, _ = mimetypes.guess_type(f"f.{e}", strict=False)
        print(f".{e} -> {mt}")


if __name__ == "__main__":
    main()
