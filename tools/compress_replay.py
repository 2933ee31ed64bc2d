#!/usr/bin/env python3
"""Independent replay of the engine's compression-ratio signal
(functions/DeflateLen.scala + TextOps.compressionRatio) for the
machine-checked digest pin in TextOpsSpec — the same role
bpe_replay.py plays for the trained-BPE gates (verdict r19 task 4:
graduate text_compress_ratio from prose rationale to a value check).

The JDK Deflater at DEFAULT_COMPRESSION with nowrap=true IS zlib raw
deflate at level 6 (zlib maps -1 to 6): replaying through CPython's
independently-built zlib binding pins the engine's native expression
against a second implementation of the SAME underlying algorithm.
Caveat stays as documented in DeflateLen.scala: deflate output length
is contractual only within a zlib build lineage, so the digest is a
CI pin for this environment, not a cross-platform constant — which is
exactly what the driver's gate environment is.

Prints md5 over `doc_id\\tn_bytes\\tdeflate_bytes` lines in doc_id
order (ratio is a derived quotient of the two pinned integers).
Run: tools/compress_replay.py [sfdir]
"""
import hashlib
import sys
import zlib

import pyarrow.parquet as pq


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows = pq.read_table(f"{sfdir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    lines = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        data = r["text"].encode("utf-8")
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        n = len(c.compress(data)) + len(c.flush())
        lines.append(f"{r['doc_id']}\t{len(data)}\t{n}")
    digest = hashlib.md5(("\n".join(lines) + "\n").encode()).hexdigest()
    print(f"docs={len(rows)} digest={digest}")


if __name__ == "__main__":
    main()
