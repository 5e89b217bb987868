#!/usr/bin/env python3
"""Organic sf1 fixture: every table at 10x sf0.1, for the FULL-SUITE scale
probe (driver-side tooling only; writes to /tmp, never used for
correctness oracles).

Relational tables replicate with per-key offsets that PRESERVE referential
integrity (replica i's orders reference replica i's customers, etc.), so
join fan-outs, group sizes and window shapes stay organic — input grows
10x, per-key densities stay flat. The two dims (region, nation) stay
fixed, as TPC-H scaling does. events share the customer-key offset so the
events<->customer joins (q68/q77/q114...) keep their shape.

documents/embeddings reuse the ORGANIC mutation scheme from
make_probe_organic.py (replica 1 = genuine near-dup mate, replicas 2-9 =
distinct content), so the dedup family sees organic pair growth, not
replica amplification.

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/graft_sf1)
"""
import os
import sys

import pandas as pd

import make_probe_organic as org

SRC = "/root/testdata/sf0.1"
REPS = 10


def off(maxval: int) -> int:
    """Smallest power of ten past maxval: readable disjoint id ranges."""
    o = 10
    while o <= maxval:
        o *= 10
    return o


def scale(outdir: str, table: str, key_offsets: dict) -> None:
    base = pd.read_parquet(f"{SRC}/{table}.parquet")
    parts = [base]
    for i in range(1, REPS):
        rep = base.copy()
        for col, o in key_offsets.items():
            rep[col] = rep[col] + i * o
        parts.append(rep)
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(f"{outdir}/{table}.parquet", index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    print(f"wrote {len(out)} rows to {outdir}/{table}.parquet")


def main(argv) -> None:
    outdir = argv[0] if argv else "/tmp/graft_sf1"
    os.makedirs(outdir, exist_ok=True)

    # fixed dims: straight copies
    for t in ("region", "nation"):
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(
            f"{outdir}/{t}.parquet", index=False)
        print(f"copied {t}")

    cust = pd.read_parquet(f"{SRC}/customer.parquet")
    orders = pd.read_parquet(f"{SRC}/orders.parquet")
    part = pd.read_parquet(f"{SRC}/part.parquet")
    supp = pd.read_parquet(f"{SRC}/supplier.parquet")
    ev = pd.read_parquet(f"{SRC}/events.parquet")

    # one offset per key DOMAIN, shared across every table referencing it
    o_cust = off(int(max(cust["c_custkey"].max(), ev["user_id"].max())))
    o_ord = off(int(orders["o_orderkey"].max()))
    o_part = off(int(part["p_partkey"].max()))
    o_supp = off(int(supp["s_suppkey"].max()))
    o_event = off(int(ev["event_id"].max()))

    scale(outdir, "customer", {"c_custkey": o_cust})
    scale(outdir, "supplier", {"s_suppkey": o_supp})
    scale(outdir, "part", {"p_partkey": o_part})
    scale(outdir, "orders", {"o_orderkey": o_ord, "o_custkey": o_cust})
    scale(outdir, "lineitem",
          {"l_orderkey": o_ord, "l_partkey": o_part, "l_suppkey": o_supp})
    scale(outdir, "events", {"event_id": o_event, "user_id": o_cust})

    org.make_documents(outdir, org.default_id)
    org.make_embeddings(outdir, org.default_id)


if __name__ == "__main__":
    main(sys.argv[1:])
