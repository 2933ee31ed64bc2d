#!/usr/bin/env python3
"""Deterministic version-history fixture for the _history/vread surface.

Derives fixtures/fhir/{Patient,Observation}.history.ndjson from the
committed current tables: the current row IS the latest version (so the
engine's last-wins current view must reproduce the current table
exactly), and older versions are pure functions of the resource index:

- nv = 3 if i % 10 == 0 else 2 if i % 5 == 0 else 1
- version k (1..nv): meta.versionId = str(k); versions k < nv get the
  year of meta.lastUpdated rebased to 2024 - (nv - k) (ISO ordering ==
  version ordering) and a visible per-type mutation so vread output is
  version-specific: Patient family -> "<family>-v<k>", Observation
  status -> "preliminary".

Run once; output is committed (same policy as gen_fhir_fixtures.py).
"""
import copy
import json
import os
import re

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")


def versions(row, mutate):
    i = int(row["id"].split("-")[-1])
    nv = 3 if i % 10 == 0 else 2 if i % 5 == 0 else 1
    out = []
    for k in range(1, nv + 1):
        v = copy.deepcopy(row)
        v.setdefault("meta", {})["versionId"] = str(k)
        if k < nv:
            year = 2024 - (nv - k)
            v["meta"]["lastUpdated"] = re.sub(
                r"^\d{4}", str(year), v["meta"]["lastUpdated"])
            mutate(v, k)
        out.append(v)
    return out


def mutate_patient(v, k):
    for name in v.get("name", []):
        if "family" in name:
            name["family"] = f"{name['family']}-v{k}"


def mutate_observation(v, k):
    v["status"] = "preliminary"


def mutate_docref(v, k):
    # superseded versions of the churn-heavy type the assay pipeline
    # rewrites (assay.py touches every linked doc) — vread must surface
    # the pre-rewrite status
    v["status"] = "superseded"


def main():
    for t, mutate in [("Patient", mutate_patient),
                      ("Observation", mutate_observation),
                      ("DocumentReference", mutate_docref)]:
        rows = [json.loads(l) for l in open(os.path.join(FIX, f"{t}.ndjson"))]
        with open(os.path.join(FIX, f"{t}.history.ndjson"), "w") as f:
            for row in rows:
                for v in versions(row, mutate):
                    f.write(json.dumps(v) + "\n")
        print(f"wrote history for {len(rows)} {t} rows")


if __name__ == "__main__":
    main()
