#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from one full clean bench
run JSON (target/bench_latest.json or a bench_evidence/ copy) plus a
time_duckdb.py output for the DuckDB column.

Usage: python3 tools/gen_baseline_table.py <bench.json> <duckdb.json>
Rewrites everything from the '| query |' header to EOF in BASELINE.md.
"""
import json
import sys

def main(bench_path, duck_path, baseline="BASELINE.md"):
    bench = json.load(open(bench_path))
    duck = json.load(open(duck_path))["queries"]
    lines = open(baseline).read().splitlines(keepends=True)
    hdr = next(i for i, l in enumerate(lines)
               if l.startswith("| query |"))
    out = lines[:hdr]
    out.append("| query | spark sec (sf0.1) | duckdb sec (sf0.1) |\n")
    out.append("|---|---|---|\n")
    # charge min(first, rerun) — the same number total_adj charges: a
    # contention-spiked first pass must not become the committed row
    # (it would blind the 3x rerun detector for that gate AND flatter
    # every future run's ratio against an inflated denominator)
    reruns = bench.get("reruns", {})
    for q in sorted(bench["queries"]):
        s = bench["queries"][q]
        if q in reruns and reruns[q][1] > 0:
            s = min(s, reruns[q][1])
        d = f"{duck[q]:.2f}" if q in duck else "—"
        out.append(f"| {q} | {s:.2f} | {d} |\n")
    open(baseline, "w").writelines(out)
    print(f"wrote {len(bench['queries'])} rows "
          f"(total {bench['value']} s / {bench['nqueries']} gates)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
