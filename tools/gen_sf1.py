#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (~10x sf0.1) for the heavy-gate
parity sweep — the driver only gates sf0.01, and round 10 proved that
10x-the-gated-scale sweeps catch latent defects (the q09 window-order
tie). This builds 10x-the-BENCH-scale (~6M lineitem rows) so the same
class of defect (ties, overflows, sort instability) gets one more
decade of exposure.

Construction: fact tables replicate 10x with disjoint key offsets
(replica 0 is sf0.1 verbatim); dimension tables copy unchanged so
FK joins stay consistent. Text/embedding replicas are DETERMINISTICALLY
decorrelated — replica k>0 shuffles each document's words by
md5(k:word:pos) and rotates each embedding by k positions — so
near-dup/similarity gates don't drown in artificial cross-replica
duplicate cliques (volume scales, pair structure stays organic).

Output: /root/repo/target/sf1/*.parquet (never /root/testdata — that
dir is read-only by contract). Usage:
    python3 tools/gen_sf1.py [src_dir] [out_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
K = 10  # replicas


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT * FROM range({K}) t(k)")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # dimensions: verbatim (FKs in the replicated facts stay valid)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        write(t, f"SELECT * FROM {src(t)}")

    # orders + lineitem share the same orderkey offset per replica
    write("orders", f"""
        SELECT o_orderkey + k * 10000000 AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, r""")
    write("lineitem", f"""
        SELECT l_orderkey + k * 10000000 AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, r""")

    # events: user offset keeps (user_id, ts) unique per replica
    write("events", f"""
        SELECT event_id + k * 10000000 AS event_id, ts,
               user_id + k * 1000000 AS user_id, event_type, value, props
        FROM {src('events')}, r""")

    # Replica offsets below are k*10000: collisions would silently
    # corrupt the dedup/similarity sweep this tool exists to validate,
    # so refuse sources whose ids reach the offset stride.
    for t, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        mx = con.execute(f"SELECT max({key}) FROM {src(t)}").fetchone()[0]
        assert mx < 10000, (
            f"{t}.{key} max {mx} >= replica offset stride 10000; "
            "raise the stride or replicas will collide")

    # documents: replica 0 verbatim; k>0 deterministic word shuffle
    # (destroys n-gram continuity across replicas; token multiset — and
    # hence quality/langid/tf stats DISTRIBUTIONS — unchanged)
    write("documents", f"""
        SELECT doc_id + k * 10000 AS doc_id,
               CASE WHEN k = 0 THEN text ELSE array_to_string(
                 list_transform(
                   list_sort(
                     list_transform(string_split(text, ' '),
                       (w, i) -> {{'key': md5(CAST(k AS VARCHAR) || ':' || w
                                        || ':' || CAST(i AS VARCHAR)),
                                   'w': w}}),
                     'ASC'),
                   s -> s.w), ' ')
               END AS text,
               lang, source, n_chars
        FROM {src('documents')}, r""")

    # embeddings: replica 0 verbatim; k>0 rotated by k positions
    # (norm-preserving, direction-decorrelated)
    write("embeddings", f"""
        SELECT vec_id + k * 10000 AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE embedding[k + 1:] || embedding[1:k] END AS embedding,
               label
        FROM {src('embeddings')}, r""")


if __name__ == "__main__":
    main()
