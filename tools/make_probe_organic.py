#!/usr/bin/env python3
"""Organic (non-replica) 10x scale-probe fixture for the dedup family.

The round-7 probe replicated sf0.1 exactly (9 identical copies per doc),
which deliberately maximizes near-dup pair amplification (~100x pairs for
10x input). This generator produces the ORGANIC variant the round-7
verdict asked for: each of the 9 extra copies gets a fresh doc_id
(+i*1e8, the same key-offset convention) and a PERTURBED text — the
token tail (second half) is deterministically shuffled with a
replica-specific seed — so shingle overlap with the original is partial
and near-dup density stays at organic levels instead of every family
being 10 exact copies.

Driver-side tooling only (pandas/pyarrow); writes to /tmp, never used
for correctness oracles.

Usage: python3 tools/make_probe_organic.py [outdir]
"""
import random
import sys

import pandas as pd


def perturb(text: str, seed: int) -> str:
    toks = text.split(" ")
    half = len(toks) // 2
    head, tail = toks[:half], toks[half:]
    rng = random.Random(seed)
    rng.shuffle(tail)
    return " ".join(head + tail)


def main(outdir: str) -> None:
    src = "/root/testdata/sf0.1/documents.parquet"
    base = pd.read_parquet(src)
    parts = [base]
    for i in range(1, 10):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + i * 100_000_000
        rep["text"] = [
            perturb(t, d * 10 + i) for t, d in zip(base["text"], base["doc_id"])
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
