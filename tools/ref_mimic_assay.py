#!/usr/bin/env python3
"""Local ground-truth: re-run the reference assay algorithm
(/root/reference/scripts/assay.py logic, minus pydantic validation) over
fixtures/fhir, printing summary facts used to pin ScalaTest assertions and
to sanity-check the DuckDB oracle SQL. Not part of the engine.
"""
import json
import mimetypes
import os
import urllib.parse
import uuid

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")

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


def load(name):
    with open(os.path.join(FIX, name)) as f:
        return [json.loads(l) for l in f if l.strip()]


def update_mime_type(doc):
    attachment = doc['content'][0]['attachment']
    title = attachment.get('title', None)
    url = attachment.get('url', None)
    file_name = title
    if url:
        path = urllib.parse.urlparse(url).path
        if '.' in path:
            file_name = path
    (mimetype, enc) = mimetypes.guess_type(file_name, strict=False)
    if mimetype is None:
        mimetype = 'application/octet-stream'
    attachment['contentType'] = mimetype
    return doc


def create_assay_refactor_docs(assay_id, patient_reference, specimen_references, assay_documents):
    assay_dict = {"resourceType": "ServiceRequest", "id": assay_id,
                  "subject": {"reference": patient_reference},
                  "specimen": [{"reference": _} for _ in specimen_references]}
    for doc in assay_documents:
        doc['subject'] = {"reference": patient_reference}
        del doc['version']
        del doc['content'][0]['profile']
        if 'context' not in doc:
            doc['context'] = {}
        context = doc['context']
        if 'related' not in context:
            context['related'] = []
        context['related'].append({"reference": f"ServiceRequest/{assay_id}"})
        update_mime_type(doc)
    return assay_dict


def main():
    document_references = load("DocumentReference.ndjson")
    groups = load("Group.ndjson")
    specimens = {s['id']: s for s in load("Specimen.ndjson")}

    docs_by_group = {}
    for doc in document_references:
        gid = doc['subject']['reference'].split('/')[1]
        docs_by_group.setdefault(gid, []).append(doc)

    assays = []
    groups_with_specimen = set()
    for group in groups:
        patient_reference = None
        specimen_references = []
        for member in group.get('member', []):
            if 'reference' in member['entity']:
                if member['entity']['reference'].startswith('Specimen/'):
                    sid = member['entity']['reference'].split('/')[1]
                    specimen_references.append(member['entity']['reference'])
                    if sid in specimens:
                        patient_reference = specimens[sid]['subject']['reference']
        if not patient_reference or not specimen_references:
            continue
        groups_with_specimen.add(group['id'])
        assay_documents = docs_by_group.get(group['id'], [])
        assays.append(create_assay_refactor_docs(
            group['id'], patient_reference, specimen_references, assay_documents))

    groups = [g for g in groups if g['id'] not in groups_with_specimen]

    for doc in document_references:
        if doc['subject']['reference'].startswith('Specimen/'):
            sid = doc['subject']['reference'].split('/')[1]
            patient_reference = specimens[sid]['subject']['reference']
            assay_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, doc['id'] + '-assay'))
            assays.append(create_assay_refactor_docs(
                assay_id, patient_reference, [f"Specimen/{sid}"], [doc]))

    non_patient = [(d['id'], d['subject']['reference']) for d in document_references
                   if not d['subject']['reference'].startswith('Patient/')]
    assert len(non_patient) == len(groups), (non_patient, [g['id'] for g in groups])

    print(f"assays: {len(assays)}")
    print(f"claimed groups: {sorted(groups_with_specimen)}")
    print(f"remaining groups: {[g['id'] for g in groups]}")
    print(f"non-patient docs after: {non_patient}")
    # per-assay summary for oracle cross-check
    with open("/tmp/expected_assays.json", "w") as f:
        for a in sorted(assays, key=lambda x: x['id']):
            f.write(json.dumps({
                "id": a["id"], "subject_ref": a["subject"]["reference"],
                "specimen_refs": "|".join(s["reference"] for s in a["specimen"])}) + "\n")
    with open("/tmp/expected_docs.json", "w") as f:
        for d in sorted(document_references, key=lambda x: x['id']):
            att0 = d['content'][0]['attachment']
            rel = d.get('context', {}).get('related', [])
            f.write(json.dumps({
                "doc_id": d["id"], "subject_ref": d["subject"]["reference"],
                "version": d.get("version"),
                "content_type": att0.get("contentType"),
                "has_profile0": "profile" in d["content"][0],
                "related_refs": "|".join(r["reference"] for r in rel)}) + "\n")
    print("wrote /tmp/expected_assays.json /tmp/expected_docs.json")
    # spot facts
    a_by_id = {a['id']: a for a in assays}
    print("g-03 patient:", a_by_id['g-03']['subject']['reference'])
    print("g-03 specimens:", [s['reference'] for s in a_by_id['g-03']['specimen']])


if __name__ == "__main__":
    main()
