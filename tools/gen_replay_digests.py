#!/usr/bin/env python3
"""Round-20: corpus-keyed replay-digest table (verdict r19 task 4 —
graduate the BPE/compress rows-only gates to machine-checked oracles).

The three signals DuckDB cannot recompute itself (iteratively-trained
BPE twice, deflate once) become oracle-checked this way: this tool runs
the INDEPENDENT Python replays (bpe_replay.py's algorithm-definition
train+encode+pack, compress_replay.py's CPython-zlib deflate) over every
driver test scale and records each digest KEYED BY A CORPUS FINGERPRINT
(md5 over `doc_id\\ttext` lines, doc_id order — computable in plain SQL).
The gate's oracle then computes the fingerprint of the corpus it was
handed and looks up the replay digest for exactly that corpus:

  engine digest == replay digest  for the corpus both sides actually read.

Scale-proof (any recorded corpus verifies; an unrecorded one misses the
lookup and fails LOUDLY as a 0-row oracle), and the constants' provenance
is committed code, not hand-typed numbers. Regenerate after any testdata
refresh: python3 tools/gen_replay_digests.py
"""
import csv
import hashlib
import os
import sys
import zlib

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bpe_replay  # noqa: E402

# driver scales plus the sweep fixtures (target/sf1, target/sf10 —
# recorded when present so the sf1/sf10 heavy-gate sweeps keep their
# oracle instead of regressing to a 0-row lookup)
SCALES = [("sf0.001", "/root/testdata/sf0.001"),
          ("sf0.01", "/root/testdata/sf0.01"),
          ("sf0.1", "/root/testdata/sf0.1"),
          ("sf1", "/root/repo/target/sf1"),
          ("sf10", "/root/repo/target/sf10")]
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "replay_digests.csv")


def md5_lines(lines):
    return hashlib.md5(("\n".join(lines) + "\n").encode()).hexdigest()


def corpus_md5(rows):
    return hashlib.md5("\n".join(
        f"{r['doc_id']}\t{r['text']}"
        for r in sorted(rows, key=lambda r: r["doc_id"])).encode()).hexdigest()


def bpe_digests(rows, num_merges=30):
    counts = {}
    for r in rows:
        for w in bpe_replay.JAVA_WS.split(r["text"].lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    merges = bpe_replay.train(
        [(w, c) for w, c in counts.items() if c >= 2], num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    lines = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        toks = []
        for w in bpe_replay.JAVA_WS.split(r["text"].lower()):
            if w:
                toks.extend(bpe_replay.encode_word(w, ranks))
        lines.append(f"{r['doc_id']}\t" + " ".join(toks))
    return md5_lines(lines), bpe_replay.pack_digest(rows, ranks, 256)


def compress_digest(rows):
    lines = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        data = r["text"].encode("utf-8")
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        n = len(c.compress(data)) + len(c.flush())
        lines.append(f"{r['doc_id']}\t{len(data)}\t{n}")
    return md5_lines(lines)


def main():
    recs = []
    for sf, base in SCALES:
        path = f"{base}/documents.parquet"
        if not os.path.exists(path):
            print(f"{sf}: {path} absent, skipped")
            continue
        rows = pq.read_table(path,
                             columns=["doc_id", "text"]).to_pylist()
        cm = corpus_md5(rows)
        tok, pack = bpe_digests(rows)
        recs.append(("bpe_tokens", cm, tok))
        recs.append(("pack_bpe_256", cm, pack))
        recs.append(("compress_ratio", cm, compress_digest(rows)))
        print(f"{sf}: corpus={cm} tok={tok} pack={pack}")
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["surface", "corpus_md5", "digest"])
        w.writerows(recs)
    print(f"wrote {len(recs)} rows -> {OUT}")


if __name__ == "__main__":
    main()
