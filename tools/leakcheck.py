#!/usr/bin/env python3
"""Self-evidencing leak scan: no proprietary/internal system references.

Scans every tracked source/doc file for patterns that would indicate a
non-public dependency (internal package imports, private bucket URIs,
internal hostnames, API keys, workspace links, internal env vars) and
writes LEAKCHECK.json with run metadata — timestamp, file count, content
digest — so each round's result is reproducible and distinguishable
from a hand-edit (ADVICE round 8).

Usage: python3 tools/leakcheck.py [--round N]
"""
import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time

PATTERNS = {
    # imports outside the public surface: spark/scala/java stdlib,
    # scalatest/scalacheck (build.sbt), and this repo's own graft.*
    # (spark.implicits / <sessionVal>.implicits are local-val imports,
    # not packages)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.spark|org\.apache\.hadoop|org\.scalatest|org\.scalacheck"
        r"|scala\.|java\.|javax\.|graft\.|spark\.|\w+\.implicits)"
        r"[a-z_]+\.[a-z_]+\.", re.M),
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.|example\.|.*\b(apache|scala-lang|github|"
        r"snomed|loinc|hl7|terminology|w3|cloud\.google|duckdb|unitsofmeasure)\b)"
        r"[a-z0-9.-]*\.(corp|internal|intra|private)\b"),
    # fhir-aggregator-public is the reference's own public dataset bucket
    # (cited from its README); '...' is doc ellipsis
    "internal-bucket": re.compile(
        r"\b(gs|s3|s3a|abfss?)://(?!example|bucket\b|my-|\.\.\.|"
        r"fhir-aggregator-public)[a-z0-9._-]{3,}/"),
    "slack-link": re.compile(r"slack\.com/archives|go/[a-z][a-z0-9-]{1,30}\b"),
    "api-key": re.compile(r"\b(sk|pk|key|token)-[A-Za-z0-9]{20,}\b|AKIA[0-9A-Z]{16}"),
    "env-secret": re.compile(r"\b[A-Z_]*(SECRET|PASSWORD|CREDENTIAL)[A-Z_]*\s*="),
}

SCAN_EXT = (".scala", ".py", ".md", ".sbt", ".json", ".ndjson", ".sql")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()

    # resolve the repo root from this file's location so the scan works
    # from any cwd — a swallowed FileNotFoundError here would otherwise
    # report a false-clean scan
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True, cwd=root,
    ).stdout.split()
    files = [f for f in files if f.endswith(SCAN_EXT)]

    hits = {k: [] for k in PATTERNS}
    digest = hashlib.sha256()
    scanned = 0
    for f in sorted(files):
        text = open(os.path.join(root, f), encoding="utf-8",
                    errors="replace").read()
        scanned += 1
        digest.update(f.encode() + b"\0" + text.encode())
        for name, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}: {m.group(0)[:80]}")

    n = sum(len(v) for v in hits.values())
    out = {
        "round": args.round,
        "n_hits": n,
        "hits": hits,
        "run": {
            "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "files_scanned": scanned,
            "content_sha256": digest.hexdigest(),
            "tool": "tools/leakcheck.py",
        },
    }
    json.dump(out, open(os.path.join(root, "LEAKCHECK.json"), "w"), indent=2)
    print(f"{scanned} files scanned, {n} hits")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
