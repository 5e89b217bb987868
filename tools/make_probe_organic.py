#!/usr/bin/env python3
"""Organic (non-replica) 10x scale-probe fixture for the dedup family.

The round-7 probe replicated sf0.1 exactly (9 identical copies per doc),
which deliberately maximizes near-dup pair amplification (~100x pairs for
10x input). This generator produces the ORGANIC variant the round-7
verdict asked for: each of the 9 extra copies gets a fresh doc_id
(+i*1e8, the same key-offset convention) and a MUTATED text.

Mutation must change the token MULTISET, not just token order: SimHash
votes over distinct unigram tokens (Dedup.simHashCore), so a tail
shuffle — the first attempt — leaves every signature bit-identical and
the "organic" corpus is still 10 exact copies per family in simhash
space (measured: q34 123 s, ~100x pair amplification intact). Here each
token is suffix-mutated with probability p, which both removes it from
the multiset and kills every 3-gram shingle covering it:

- replica 1: p = 0.02 -> shingle survival ~0.98^3, Jaccard ~0.89 and
  hamming <= ~3/60, i.e. ONE genuine near-dup mate per base doc (organic
  corpora do contain near-dup families);
- replicas 2-9: p = 0.35 -> Jaccard ~0.2, hamming >> 3 — distinct
  documents that merely share vocabulary.

Net: 10x input, ~2x near-dup pair density — the organic shape.

Driver-side tooling only (pandas/pyarrow); writes to /tmp, never used
for correctness oracles.

Usage: python3 tools/make_probe_organic.py [outdir]
"""
import random
import sys

import pandas as pd


def perturb(text: str, seed: int, p: float) -> str:
    rng = random.Random(seed)
    out = []
    for t in text.split(" "):
        if rng.random() < p:
            out.append(t + "q%d" % rng.randrange(1000))
        else:
            out.append(t)
    return " ".join(out)


def main(outdir: str) -> None:
    src = "/root/testdata/sf0.1/documents.parquet"
    base = pd.read_parquet(src)
    parts = [base]
    for i in range(1, 10):
        p = 0.02 if i == 1 else 0.35
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + i * 100_000_000
        rep["text"] = [
            perturb(t, d * 10 + i, p) for t, d in zip(base["text"], base["doc_id"])
        ]
        rep["n_chars"] = rep["text"].str.len()
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    import os

    os.makedirs(outdir, exist_ok=True)
    out.to_parquet(f"{outdir}/documents.parquet", index=False)
    print(f"wrote {len(out)} docs to {outdir}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_probe10x_organic")
