#!/usr/bin/env python3
"""Byte-level comparison of two Verify output dirs.

The refactoring safety net: when a rewrite claims identical semantics
(e.g. the round-6 fused IVF assignment, or the whole-vector pair join),
dump Verify before and after and diff the outputs — for approximate /
rows-only queries this is STRONGER than the oracle gate, which only
checks row counts for them.

Usage: python3 tools/diff_outputs.py /tmp/verify_before /tmp/verify_after [query ...]
"""
import glob
import os
import sys

import duckdb


def rows(con, d, q):
    files = glob.glob(f"{d}/{q}/*.parquet")
    if not files:
        return None
    return sorted(con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchall())


def main(before, after, names):
    con = duckdb.connect()
    if not names:
        names = sorted(os.path.basename(p.rstrip("/")) for p in
                       glob.glob(f"{after}/*/") )
    n_same = n_diff = n_skip = 0
    for q in names:
        old, new = rows(con, before, q), rows(con, after, q)
        if old is None or new is None:
            print(f"SKIP {q}: missing on {'before' if old is None else 'after'} side")
            n_skip += 1
        elif old == new:
            print(f"IDENTICAL {q} ({len(old)} rows)")
            n_same += 1
        else:
            diffs = [(a, b) for a, b in zip(old, new) if a != b]
            print(f"DIFFER {q}: rows {len(old)} vs {len(new)}; "
                  f"first diff: {diffs[0] if diffs else '(row count only)'}")
            n_diff += 1
    print(f"\n{n_same} identical, {n_diff} differ, {n_skip} skipped")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
