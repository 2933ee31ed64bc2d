#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB against a given sf dir — the
single-node comparison column for BASELINE.md's measured table.

Usage: python3 tools/time_duckdb.py <oracle_sql.json> <sf_dir> [out.json]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(oracle_path, sf_dir, out_path=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    times = {}
    total = 0.0
    for name in sorted(oracle):
        t0 = time.monotonic()
        con.execute(oracle[name]).fetchall()
        dt = time.monotonic() - t0
        times[name] = round(dt, 3)
        total += dt
    result = {"total": round(total, 3), "n": len(times), "queries": times}
    print(json.dumps({"total": result["total"], "n": result["n"]}))
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
