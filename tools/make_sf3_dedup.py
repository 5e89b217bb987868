#!/usr/bin/env python3
"""Organic sf3-equivalent fixture for the DENSITY-SENSITIVE dedup family
(documents + embeddings only, 30x sf0.1).

The sf1 gate interpolates one decade of ROW growth; the dedup/cluster
family's failure mode (LSH bucket occupancy, pair-graph growth) is
superlinear in near-dup DENSITY, which organic corpora grow by forming
LARGER near-dup families, not just more of them. This fixture models
that: 30 replicas per base doc, where every replica with i % 10 == 1
(i = 1, 11, 21) is a genuine near-dup mate (token-mutation p = 0.02,
Jaccard ~0.89 against the base AND against each other) and the rest are
distinct content (p = 0.35). Near-dup FAMILIES therefore have size 4
(base + 3 mates) -> C(4,2) = 6 intra-family pairs where sf1 had 1, on 3x
sf1's rows: pair density grows superlinearly exactly as a 100-TB crawl
corpus's does, which is what the gated queries must survive.

Embeddings follow the same design (i % 10 == 1 -> cosine ~0.99 mate,
else fresh random direction at a resampled norm).

Only documents + embeddings are written: the gated queries
(q33/q34/q46b/q50/q101-family) read nothing else. Driver-side tooling
only; writes to /tmp, never used for correctness oracles.

WHY ORGANIC, NOT REPLICATED (the round-7 lesson, BENCH_NOTES "Round
7"): an exact-replica fixture is adversarial for dedup — every doc
gains N-1 identical copies, candidate pairs grow ~N^2x, and an honest
pair-bounded operator looks superlinear purely from output volume. A
density gate run on replicas measures replica amplification, not the
operator. This generator instead grows near-dup FAMILIES organically
(3 genuine mates + 26 distinct-content replicas per base doc), the
shape a real crawl corpus has; keep it that way.

Usage: python3 tools/make_sf3_dedup.py [outdir]  (default /tmp/graft_sf3_dedup)
"""
import os
import sys

import numpy as np
import pandas as pd

import make_probe_organic as org

REPS = 30
SRC = "/root/testdata/sf0.1"


def make_documents(outdir: str) -> None:
    base = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = [base]
    for i in range(1, REPS):
        p = 0.02 if i % 10 == 1 else 0.35
        rep = base.copy()
        rep["doc_id"] = [org.default_id(d, i) for d in base["doc_id"]]
        rep["text"] = [
            org.perturb(t, d * 10 + i, p)
            for t, d in zip(base["text"], base["doc_id"])
        ]
        rep["n_chars"] = rep["text"].str.len()
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(f"{outdir}/documents.parquet", index=False)
    print(f"wrote {len(out)} docs to {outdir}/documents.parquet")


def make_embeddings(outdir: str) -> None:
    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    vecs = np.stack(base["embedding"].to_numpy())
    n, dim = vecs.shape
    norms = np.linalg.norm(vecs.astype(np.float64), axis=1)
    parts = [base]
    for i in range(1, REPS):
        rng = np.random.RandomState(3000 + i)
        rep = base.copy()
        rep["vec_id"] = [org.default_id(v, i) for v in base["vec_id"]]
        if i % 10 == 1:
            noise = rng.normal(0.0, 0.018, size=(n, dim))
            v2 = vecs.astype(np.float64) / norms[:, None] + noise
            v2 = v2 / np.linalg.norm(v2, axis=1)[:, None] * norms[:, None]
        else:
            v2 = rng.normal(0.0, 1.0, size=(n, dim))
            v2 = v2 / np.linalg.norm(v2, axis=1)[:, None]
            v2 = v2 * norms[rng.randint(0, n, size=n)][:, None]
        rep["embedding"] = list(v2.astype(np.float32))
        rep["label"] = rng.randint(0, base["label"].max() + 1, size=n).astype(
            base["label"].dtype
        )
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(f"{outdir}/embeddings.parquet", index=False)
    print(f"wrote {len(out)} vectors to {outdir}/embeddings.parquet")


def main(argv) -> None:
    outdir = argv[0] if argv else "/tmp/graft_sf3_dedup"
    os.makedirs(outdir, exist_ok=True)
    make_documents(outdir)
    make_embeddings(outdir)


if __name__ == "__main__":
    main(sys.argv[1:])
