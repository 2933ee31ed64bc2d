#!/usr/bin/env python3
"""Round-20 fixture: an update-create ingest batch (verdict r19 task 2).

The reference store runs with --enable-update-create (README.md:29):
a PUT with a client-supplied id UPSERTS — update where the id exists
(server bumps meta.versionId), create at version 1 where it does not.
This batch exercises both halves against the committed Patient.history
feed: six updates of existing feed ids (three of them ids that already
carry multiple versions, so the bump lands on the true max, not on 1)
and three creates of brand-new ids. Client-supplied rows carry NO meta
— version assignment is the server's job (FhirStore.updateCreateRows).

Deterministic, pure function of the id index; idempotent regeneration.
The committed fixture is the source of truth.
"""
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")

UPDATES = ["p-001", "p-005", "p-010", "p-015", "p-020", "p-038"]
CREATES = ["p-101", "p-102", "p-103"]


def patient(pid, revised):
    i = int(pid.split("-")[-1])
    fam = f"Family{i:03d}" + ("Rev" if revised else "")
    return {
        "resourceType": "Patient",
        "id": pid,
        "name": [{"family": fam, "given": [f"Given{i:03d}"]}],
        "gender": "female" if i % 2 == 0 else "male",
        "birthDate": f"19{50 + i % 40:02d}-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",
        "active": i % 5 != 0,
    }


def main():
    dst = os.path.join(FIX, "Patient.ingest.ndjson")
    rows = ([patient(p, revised=True) for p in UPDATES]
            + [patient(p, revised=False) for p in CREATES])
    with open(dst, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"Patient.ingest: {len(rows)} rows "
          f"({len(UPDATES)} updates, {len(CREATES)} creates)")


if __name__ == "__main__":
    main()
