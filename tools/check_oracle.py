#!/usr/bin/env python3
"""Local pre-check of Verify output vs the DuckDB oracle.

Mimics the driver's t2 gate: for each query result parquet under OUT_DIR,
run the paired oracle SQL (oracle_sql.json) in DuckDB with the sf tables
registered as views, sort columns by name, sort rows, and compare values.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: schema {gcols} != {wcols}")
            n_fail += 1
            continue
        # Arrow TYPE check: the driver's hash is type-sensitive for some
        # pairs — DuckDB HUGEINT arrives as decimal128(38,0) vs Spark's
        # int64 and diverged in round 6 (q50) even with identical values.
        # Pairs the driver's r06 run demonstrably tolerated (int32/int64,
        # string/date32, timestamp tz variants) only warn; the rest fail.
        def norm_type(t):
            s = str(t)
            if s in ("large_string", "string"):
                return "string"
            if s.startswith("timestamp["):
                return "timestamp"
            return s
        BENIGN = {frozenset(p) for p in
                  [("int32", "int64"), ("string", "date32[day]")]}
        hard, soft = [], []
        for c in gcols:
            gt, wt = str(got.schema.field(c).type), str(want.schema.field(c).type)
            if norm_type(gt) == norm_type(wt):
                continue
            (soft if frozenset((gt, wt)) in BENIGN else hard).append((c, gt, wt))
        if soft:
            print(f"WARN {name}: benign arrow type skew {soft}")
        if hard:
            print(f"FAIL {name}: arrow types differ {hard}")
            n_fail += 1
            continue
        grows = sorted([tuple(canon(v) for v in row)
                        for row in zip(*[got.column(c).to_pylist() for c in gcols])])
        wrows = sorted([tuple(canon(v) for v in row)
                        for row in zip(*[want.column(c).to_pylist() for c in wcols])])
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
        elif grows != wrows:
            diffs = [(g, w) for g, w in zip(grows, wrows) if g != w]
            print(f"FAIL {name}: {len(diffs)}/{len(grows)} rows differ; first: got={diffs[0][0]} want={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
