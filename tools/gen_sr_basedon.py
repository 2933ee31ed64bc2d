#!/usr/bin/env python3
"""Round-20 fixture backfill: non-null ServiceRequest.basedOn (verdict
r19 task 5 — the param was registered in round 19 but the assay output
leaves basedOn null, so only :missing semantics were exercised; a
compile-only registry row is not a search surface).

Store story: follow-up assays are ordered BASED ON an earlier assay —
legal R4 (ServiceRequest.basedOn targets ServiceRequest among others)
and resolvable in-store. Deterministic rule: in id order, every 3rd
assay (index % 3 == 2) is a follow-up of the assay two positions back,
so the param genuinely partitions the type (planted rows match, the
rest don't) and chains through basedOn traverse real edges. Idempotent:
rows already carrying basedOn are left untouched; the committed fixture
is the source of truth (the backfill_media_meta.py precedent — the
search store may be enriched beyond the assay golden, which stays
byte-pinned separately in expected_r4/).
"""
import json
import os

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fhir")


def main():
    path = os.path.join(FIX, "ServiceRequest.ndjson")
    rows = [json.loads(l) for l in open(path)]
    # rule computed over the id-SORTED view; the file keeps its original
    # (golden) line order
    by_id = sorted(rows, key=lambda r: r["id"])
    changed = 0
    for i, r in enumerate(by_id):
        if i % 3 == 2 and "basedOn" not in r:
            r["basedOn"] = [
                {"reference": f"ServiceRequest/{by_id[i - 2]['id']}"}]
            changed += 1
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"ServiceRequest: {changed}/{len(rows)} rows gained basedOn")


if __name__ == "__main__":
    main()
