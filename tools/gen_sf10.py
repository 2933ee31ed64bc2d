#!/usr/bin/env python3
"""Synthesize sf10-scale documents + embeddings (10x target/sf1) for the
round-19 scale spot-probes (verdict r18 task 9: one more decade of
evidence that the containment prefix filter and the SemDeDup block split
keep candidate mass near-linear). Same deterministic decorrelation as
gen_sf1.py (word shuffle / rotation), wider id stride (1000000) since
sf1 ids already reach 99999. Only the two tables the probes read are
built — the TPC-H tables stay at sf1 scale.

Usage: python3 tools/gen_sf10.py [src_dir] [out_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf10"
K = 10
STRIDE = 1000000


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT * FROM range({K}) t(k)")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    for t, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        mx = con.execute(f"SELECT max({key}) FROM {src(t)}").fetchone()[0]
        assert mx < STRIDE, f"{t}.{key} max {mx} >= stride {STRIDE}"

    write("documents", f"""
        SELECT doc_id + k * {STRIDE} AS doc_id,
               CASE WHEN k = 0 THEN text ELSE array_to_string(
                 list_transform(
                   list_sort(
                     list_transform(string_split(text, ' '),
                       (w, i) -> {{'key': md5('x' || CAST(k AS VARCHAR) || ':' || w
                                        || ':' || CAST(i AS VARCHAR)),
                                   'w': w}}),
                     'ASC'),
                   s -> s.w), ' ')
               END AS text,
               lang, source, n_chars
        FROM {src('documents')}, r""")

    write("embeddings", f"""
        SELECT vec_id + k * {STRIDE} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE embedding[k + 1:] || embedding[1:k] END AS embedding,
               label
        FROM {src('embeddings')}, r""")


if __name__ == "__main__":
    main()
