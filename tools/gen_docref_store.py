#!/usr/bin/env python3
"""Round-20 fixture: the POST-ASSAY DocumentReference store table
(verdict r19 task 1 — the assay back-link was unqueryable).

The reference's populated store holds the REWRITTEN documents: assay.py
PUTs every claimed doc back with `ServiceRequest/<assay_id>` appended to
`context.related`, the subject repointed at the Patient, and content[0]'s
contentType inferred (assay.py:193-226). The engine's committed golden of
that rewrite — fixtures/fhir/expected_r4/AssayDocumentReference.ndjson,
pinned byte-exact by AssayGoldenSpec — IS therefore the store's current
DocumentReference content, the same precedent as ServiceRequest.ndjson
being a verbatim copy of the Assay golden.

This tool copies the golden to fixtures/fhir/DocumentReference.store.ndjson
(the raw R5 input keeps the flat DocumentReference.ndjson name — it is
pinned as transform/assay INPUT by TransformGoldenSpec et al.) and adds one
server-side element the golden does not carry: a deterministic `date`
(FHIR: when the document reference was created — the R4 `date` search
param). Pure function of the numeric id suffix, year 2023 so date-range
fixtures cannot be confused with the 2024 meta.lastUpdated space.

Idempotent: re-running regenerates the identical file. The committed
fixture (not this generator) is the source of truth.
"""
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")


def doc_date(i):
    return (f"2023-{(i % 12) + 1:02d}-{((i * 7) % 28) + 1:02d}"
            f"T{i % 24:02d}:30:00Z")


def main():
    src = os.path.join(FIX, "expected_r4", "AssayDocumentReference.ndjson")
    dst = os.path.join(FIX, "DocumentReference.store.ndjson")
    rows = [json.loads(l) for l in open(src)]
    for r in rows:
        r["date"] = doc_date(int(r["id"].split("-")[-1]))
    with open(dst, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"DocumentReference.store: {len(rows)} rows")


if __name__ == "__main__":
    main()
