#!/usr/bin/env python3
"""Round-19 fixture backfill: server-maintained `meta` for ImagingStudy and
MedicationAdministration (verdict r18 task 3 — these types joined the search
registry in round 18 but could not serve the server-meta quartet
`_lastUpdated`/`_tag`/`_security`/`_profile`, so an incremental-sync client
had no floor filter on them).

Same deterministic per-index shape as gen_fhir_fixtures.py's `meta()`
(pure function of the numeric id suffix; distinct tag vocabulary and minute
per type so cross-type hashes cannot collide). Idempotent: rows that already
carry meta are left untouched. Run once; output is committed — the committed
fixtures (not the generator) are the source of truth, per the round-18
precedent of hand-evolving ImagingStudy.
"""
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")


def meta(i, code_a, code_b, minute):
    return {
        "lastUpdated": f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
                       f"T{i % 24:02d}:{minute:02d}:00Z",
        "tag": [{"system": "https://example.org/tags",
                 "code": code_a if i % 3 == 0 else code_b}],
    }


def backfill(name, code_a, code_b, minute):
    path = os.path.join(FIX, f"{name}.ndjson")
    rows = [json.loads(l) for l in open(path)]
    changed = 0
    for r in rows:
        if "meta" not in r:
            i = int(r["id"].split("-")[-1])
            r["meta"] = meta(i, code_a, code_b, minute)
            changed += 1
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"{name}: {changed}/{len(rows)} rows gained meta")


def main():
    backfill("ImagingStudy", "pacs", "modality-sync", minute=45)
    backfill("MedicationAdministration", "emar", "pharmacy", minute=50)


if __name__ == "__main__":
    main()
