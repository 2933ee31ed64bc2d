#!/usr/bin/env python3
"""Golden generator for the R5→R4 transform semantics.

Produces fixtures/fhir/expected_r4/<Type>.ndjson — the expected output of
each per-type transformation over the committed fixtures, expressed as a
declarative edit list interpreted by tiny path helpers (semantics per the
behavior documented in SURVEY.md §2.A rows A9–A17; validation omitted).
TransformGoldenSpec compares the Scala engine's full output against these.
"""
import copy
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")
OUT = os.path.join(FIX, "expected_r4")


# ---- tiny edit interpreter -------------------------------------------------

def drop(key):
    def op(r):
        r.pop(key, None)
        return r
    return op


def require_drop(key):
    def op(r):
        del r[key]  # KeyError on absence, matching reference strictness
        return r
    return op


def setconst(key, value):
    def op(r):
        r[key] = value
        return r
    return op


def rename(old, new, required=False):
    def op(r):
        if required:
            r[new] = r.pop(old)
        elif old in r:
            r[new] = r.pop(old)
        return r
    return op


def each(list_key, elem_op):
    def op(r):
        for elem in r.get(list_key) or []:
            elem_op(elem)
        return r
    return op


def custom(fn):
    return fn


# ---- per-type edit programs (SURVEY A9–A17) --------------------------------

def _docref_content(elem):
    # profile[0].valueCoding becomes `format`; profile removed
    if "profile" in elem:
        elem["format"] = elem.pop("profile")[0]["valueCoding"]


def _docref_filter(r):
    # rows whose subject.reference mentions Specimen are dropped entirely
    subj = r.get("subject") or {}
    if "Specimen" in subj.get("reference", ""):
        return None
    return r


def _encounter_reason(r):
    # quirk preserved: gated on `reason`, but reads/pops top-level
    # `reference` (default []); `reason` itself stays
    if "reason" in r:
        r["reasonReference"] = [x["reference"] for x in r.pop("reference", [])]
    return r


def _encounter_class(r):
    cls = r.get("class")
    r["class"] = (cls["coding"][0] if cls is not None
                  else {"code": "NONAC", "display": "inpatient non-acute"})
    return r


def _imaging_series(elem):
    m = elem.get("modality")
    if m is not None:
        first = m["coding"][0]
        first["system"] = first["system"].replace(" ", "")
        elem["modality"] = first


def _medadmin(r):
    med = r.pop("medication", None)
    if med is not None:
        if "concept" in med:
            r["medicationCodeableConcept"] = med.pop("concept")
        else:
            r["medicationReference"] = med.pop("reference")
        r["effectiveDateTime"] = r.pop("occurenceDateTime")
        if "category" in r:
            r["category"] = r["category"][0]
    mcc = r.get("medicationCodeableConcept")
    if mcc is not None:
        first = mcc["coding"][0]
        first["system"] = first["system"].replace("'", "")
    return r


def _specimen_collection(r):
    coll = r.get("collection")
    if coll is not None:
        coll.pop("procedure", None)
    return r


PROGRAMS = {
    "DocumentReference": [require_drop("version"), each("content", _docref_content),
                          custom(_docref_filter)],
    "BodyStructure": [custom(lambda r: (
        r.__setitem__("location", r.pop("includedStructure")[0]["structure"])
        if "includedStructure" in r else None) or r)],
    "Encounter": [custom(_encounter_reason), custom(_encounter_class),
                  setconst("status", "finished")],
    "Group": [require_drop("membership"), setconst("actual", True),
              setconst("type", "person")],
    "ImagingStudy": [rename("basedOn", "procedureReference"),
                     each("series", _imaging_series)],
    "MedicationAdministration": [custom(_medadmin)],
    "ResearchStudy": [drop("name")],
    "ResearchSubject": [rename("subject", "individual", required=True),
                        setconst("status", "on-study")],
    "Specimen": [each("processing", lambda p: p.__setitem__("procedure", p.pop("method"))),
                 custom(_specimen_collection)],
}


def apply_program(program, resource):
    for op in program:
        resource = op(resource)
        if resource is None:
            return None
    return resource


def main():
    os.makedirs(OUT, exist_ok=True)
    for rtype in sorted(PROGRAMS):
        program = PROGRAMS[rtype]
        with open(os.path.join(FIX, f"{rtype}.ndjson")) as src, \
             open(os.path.join(OUT, f"{rtype}.ndjson"), "w") as dst:
            n_in = n_out = 0
            for line in src:
                n_in += 1
                result = apply_program(program, copy.deepcopy(json.loads(line)))
                if result is not None:
                    dst.write(json.dumps(result) + "\n")
                    n_out += 1
            print(f"{rtype}: {n_in} -> {n_out}")


if __name__ == "__main__":
    main()
