#!/usr/bin/env python3
"""Organic (non-replica) 10x scale-probe fixtures for the dedup family.

The round-7 probe replicated sf0.1 exactly (9 identical copies per doc),
which deliberately maximizes near-dup pair amplification (~100x pairs for
10x input). This generator produces the ORGANIC variant the round-7
verdict asked for: each of the 9 extra copies gets a fresh doc_id and a
MUTATED text / embedding.

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

Embeddings follow the same design: replica 1 is a small perturbation of
the base vector (cosine ~0.99 — a genuine semantic near-dup mate);
replicas 2-9 are FRESH random vectors drawn to match the base norm
distribution (cosine ~0 against everything — new content, not copies).

Two id conventions:

- default (organic probe, task: dedup-family ratios): new id =
  base + i*1e8 — replicas land in every id-residue class, so
  mod-5-batched queries (q81/q111) see both corpus AND batch grow 10x.
- --fixed-batch (stored-state arrival probe): new id =
  i*1e8 + base*5 + 1 — always ≡ 1 (mod 5), so the `id % 5 == 0` batch
  is EXACTLY the base batch while the `% 5 != 0` historical corpus
  grows ~12x. This isolates the per-batch arrival cost of the stored
  MinHash index (q81) and stored SemDeDup state (q111) as the corpus
  scales — the flat-per-batch claim the stored shapes exist to deliver.

Driver-side tooling only (pandas/numpy/pyarrow); writes to /tmp, never
used for correctness oracles.

Usage: python3 tools/make_probe_organic.py [outdir] [--fixed-batch]
"""
import random
import sys

import numpy as np
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


def default_id(base_id, i):
    return base_id + i * 100_000_000


def fixed_batch_id(base_id, i):
    # always ≡ 1 (mod 5): 1e8 ≡ 0 and 5*base ≡ 0, so the mod-5 batch
    # predicate never selects a replica row
    return i * 100_000_000 + base_id * 5 + 1


def make_documents(outdir: str, id_map) -> None:
    src = "/root/testdata/sf0.1/documents.parquet"
    base = pd.read_parquet(src)
    parts = [base]
    for i in range(1, 10):
        p = 0.02 if i == 1 else 0.35
        rep = base.copy()
        rep["doc_id"] = [id_map(d, i) for d in base["doc_id"]]
        rep["text"] = [
            perturb(t, d * 10 + i, p) for t, d in zip(base["text"], base["doc_id"])
        ]
        rep["n_chars"] = rep["text"].str.len()
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(f"{outdir}/documents.parquet", index=False)
    print(f"wrote {len(out)} docs to {outdir}/documents.parquet")


def make_embeddings(outdir: str, id_map) -> None:
    src = "/root/testdata/sf0.1/embeddings.parquet"
    base = pd.read_parquet(src)
    vecs = np.stack(base["embedding"].to_numpy())  # (n, dim) float32
    n, dim = vecs.shape
    norms = np.linalg.norm(vecs.astype(np.float64), axis=1)
    parts = [base]
    for i in range(1, 10):
        rng = np.random.RandomState(1000 + i)
        rep = base.copy()
        rep["vec_id"] = [id_map(v, i) for v in base["vec_id"]]
        if i == 1:
            # near-dup mate: small additive noise, renormalized to the
            # original norm -> cosine ~ 1/sqrt(1 + sig^2*dim) ~ 0.99
            noise = rng.normal(0.0, 0.018, size=(n, dim))
            v2 = vecs.astype(np.float64) / norms[:, None] + noise
            v2 = v2 / np.linalg.norm(v2, axis=1)[:, None] * norms[:, None]
        else:
            # fresh content: random directions scaled to norms RESAMPLED
            # from the base distribution — cosine ~ N(0, 1/dim) against
            # every other vector, i.e. no near-dup relation
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
    fixed = "--fixed-batch" in argv
    args = [a for a in argv if not a.startswith("--")]
    outdir = args[0] if args else (
        "/tmp/graft_probe10x_fixedbatch" if fixed else "/tmp/graft_probe10x_organic"
    )
    id_map = fixed_batch_id if fixed else default_id
    import os

    os.makedirs(outdir, exist_ok=True)
    make_documents(outdir, id_map)
    make_embeddings(outdir, id_map)


if __name__ == "__main__":
    main(sys.argv[1:])
