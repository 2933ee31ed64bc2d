#!/usr/bin/env python3
"""Golden generator: run the reference's transform.py logic
(/root/reference/scripts/transform.py:11-129, re-implemented verbatim,
validation omitted) over fixtures/fhir/*.ndjson and write the expected R4
outputs to fixtures/fhir/expected_r4/<Type>.ndjson. Committed; the
TransformGoldenSpec compares the engine's full output frame against these
field for field.
"""
import copy
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")
OUT = os.path.join(FIX, "expected_r4")


def transform_documentreference(resource):
    del resource["version"]
    if "content" in resource:
        for content in resource["content"]:
            if "profile" in content:
                content["format"] = content.pop("profile")[0]["valueCoding"]
    if "subject" in resource and "reference" in resource["subject"]:
        if "Specimen" in resource["subject"]["reference"]:
            return None
    return resource


def transform_bodystructure(resource):
    if "includedStructure" in resource:
        resource["location"] = resource.pop("includedStructure")[0]["structure"]
    return resource


def transform_encounter(resource):
    if "reason" in resource:
        resource["reasonReference"] = [ref["reference"] for ref in resource.pop("reference", [])]
    if "class" in resource:
        resource["class"] = resource["class"]["coding"][0]
    else:
        resource["class"] = {"code": "NONAC", "display": "inpatient non-acute"}
    resource["status"] = "finished"
    return resource


def transform_group(resource):
    del resource["membership"]
    resource["actual"] = True
    resource["type"] = "person"
    return resource


def transform_imagingstudy(resource):
    if "basedOn" in resource:
        resource["procedureReference"] = resource.pop("basedOn")
    if "series" in resource:
        for series in resource["series"]:
            if "modality" in series:
                series["modality"] = series["modality"]["coding"][0]
                series["modality"]["system"] = series["modality"]["system"].replace(" ", "")
    return resource


def transform_medicationadministration(resource):
    if "medication" in resource:
        _medication = resource.pop("medication")
        if "concept" in _medication:
            resource["medicationCodeableConcept"] = _medication.pop("concept")
        else:
            resource["medicationReference"] = _medication.pop("reference")
        resource["effectiveDateTime"] = resource.pop("occurenceDateTime")
        if "category" in resource:
            resource["category"] = resource["category"][0]
    if "medicationCodeableConcept" in resource:
        resource["medicationCodeableConcept"]["coding"][0]["system"] = \
            resource["medicationCodeableConcept"]["coding"][0]["system"].replace("'", "")
    return resource


def transform_researchstudy(resource):
    if "name" in resource:
        resource.pop("name")
    return resource


def transform_researchsubject(resource):
    resource["individual"] = resource.pop("subject")
    resource["status"] = "on-study"
    return resource


def transform_specimen(resource):
    if "processing" in resource:
        for process in resource["processing"]:
            process["procedure"] = process.pop("method")
    if "collection" in resource:
        if "procedure" in resource["collection"]:
            del resource["collection"]["procedure"]
    return resource


TRANSFORMERS = {
    "DocumentReference": transform_documentreference,
    "BodyStructure": transform_bodystructure,
    "Encounter": transform_encounter,
    "Group": transform_group,
    "ImagingStudy": transform_imagingstudy,
    "MedicationAdministration": transform_medicationadministration,
    "ResearchStudy": transform_researchstudy,
    "ResearchSubject": transform_researchsubject,
    "Specimen": transform_specimen,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for rtype, fn in sorted(TRANSFORMERS.items()):
        with open(os.path.join(FIX, f"{rtype}.ndjson")) as f, \
             open(os.path.join(OUT, f"{rtype}.ndjson"), "w") as o:
            n_in = n_out = 0
            for line in f:
                n_in += 1
                out = fn(copy.deepcopy(json.loads(line)))
                if out is not None:
                    o.write(json.dumps(out) + "\n")
                    n_out += 1
            print(f"{rtype}: {n_in} -> {n_out}")


if __name__ == "__main__":
    main()
