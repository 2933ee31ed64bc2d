#!/usr/bin/env python3
"""Independent replay of the engine's trained-BPE path (operators/Bpe.scala)
for the token-stream digest pin in BpeSpec.

Reimplements train + encode from the ALGORITHM definition (not the Scala
code's structure): lowercased `\\s+`-split words (Java regex `\\s` is
ASCII-only — mirrored here), minCount=2 frequency table, K merge rounds
picking (count desc, pair-lexicographic asc), `</w>` end-of-word sentinel,
code-point symbols, apply = repeatedly merge the lowest-rank adjacent pair
(all occurrences per round).

Prints `md5(<doc_id>\\t<tok> <tok> ...\\n per doc, doc_id ascending)` —
the constant BpeSpec pins. Run: tools/bpe_replay.py [sfdir] [numMerges].
"""
import hashlib
import re
import sys

import pyarrow.parquet as pq

JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def train(word_counts, num_merges):
    vocab = [([*w] + ["</w>"], c) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = [(merge_pair(syms, best), c) for syms, c in vocab]
    return merges


def merge_pair(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_word(word, ranks):
    syms = [*word] + ["</w>"]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        syms = merge_pair(syms, best)
    return syms


def pack_digest(rows, ranks, seqlen):
    """Replay packSequencesGlobalTok over the replayed BPE token counts:
    one global token stream in doc_id order, cut into seqlen-token
    sequences, a document crossing a boundary spanning consecutive ones.
    Digest over `seq_id\\tdoc_id\\ttok_start\\ttok_end\\ttokens_in_seq`
    lines in (seq_id, doc_id) order — the sample_pack_bpe gate's shape.
    """
    lines = []
    tok_end = 0
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        n = 0
        for w in JAVA_WS.split(r["text"].lower()):
            if w:
                n += len(encode_word(w, ranks))
        n = max(1, n)  # the tokenEstimate >= 1 floor
        start, end = tok_end, tok_end + n
        tok_end = end
        for seq in range(start // seqlen, (end - 1) // seqlen + 1):
            tis = min(end, (seq + 1) * seqlen) - max(start, seq * seqlen)
            lines.append(f"{seq}\t{r['doc_id']}\t{start}\t{end}\t{tis}")
    lines.sort(key=lambda l: (int(l.split("\t")[0]), int(l.split("\t")[1])))
    return hashlib.md5(("\n".join(lines) + "\n").encode()).hexdigest()


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rows = pq.read_table(f"{sfdir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    counts = {}
    for r in rows:
        for w in JAVA_WS.split(r["text"].lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    wc = [(w, c) for w, c in counts.items() if c >= 2]
    merges = train(wc, num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    lines = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        toks = []
        for w in JAVA_WS.split(r["text"].lower()):
            if w:
                toks.extend(encode_word(w, ranks))
        lines.append(f"{r['doc_id']}\t" + " ".join(toks))
    digest = hashlib.md5(("\n".join(lines) + "\n").encode()).hexdigest()
    print(f"merges={len(merges)} first={merges[0]} digest={digest}")
    # tokenizer-exact packing replay (the sample_pack_bpe pin)
    print(f"pack256_digest={pack_digest(rows, ranks, 256)}")


if __name__ == "__main__":
    main()
