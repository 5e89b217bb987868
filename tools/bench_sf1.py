#!/usr/bin/env python3
"""BENCH_SF1 mode: the full-suite sf1 scale probe as a GATED number, not a
narrative. Generates the organic sf1 fixture if absent (tools/make_sf1.py),
runs graft.Bench against it, computes per-query wall ratios vs the sf0.1
record, and FAILS LOUDLY (exit 1) if any ratio exceeds the gate — so a
regression in a scale-sensitive query (q33/q34/q101...) is caught by a
number the moment it lands.

Usage:
    python3 tools/bench_sf1.py [--ref BENCH_LAST.json] [--round N]
                               [--fixture /tmp/graft_sf1] [--gate 15.0]

Writes BENCH_SF1_r{N}.json: {sf01, sf1, ratios, gate, violations, totals}.

Gate rationale (from the recorded probes, BENCH_NOTES rounds 7-10): the
organic-10x decade lands a median per-query ratio ~1.5x and a worst ~10x
(pool-saturating per-row kernels: image decode, quality regex, shingling).
15x leaves ~50% headroom over the recorded worst; anything beyond it has
historically meant superlinear work (the round-7 replica-amplified pair
explosions), which is exactly what the gate exists to catch.
Queries under MIN_SECS at sf1 are exempt: a 0.1->1.6s swing is scheduler
jitter, not scaling.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_SECS = 2.0  # sf1 wall below this can't meaningfully violate the gate


def last_json_line(path):
    with open(path) as f:
        lines = [l for l in f.read().strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def ensure_fixture(fixture):
    probe = os.path.join(fixture, "lineitem.parquet")
    if os.path.exists(probe):
        print(f"[bench_sf1] fixture {fixture} present")
        return
    print(f"[bench_sf1] generating fixture {fixture} via make_sf1.py")
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_sf1.py"),
                    fixture], check=True, cwd=os.path.join(REPO, "tools"))


def run_bench(fixture, out):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=fixture,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_OUT=out)
    print(f"[bench_sf1] running graft.Bench on {fixture}")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   check=True, cwd=REPO, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return last_json_line(out)


def next_round():
    rounds = [int(m.group(1)) for f in os.listdir(REPO)
              if (m := re.match(r"BENCH_SF1_r(\d+)\.json", f))]
    return (max(rounds) + 1) if rounds else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=os.path.join(REPO, "BENCH_LAST.json"),
                    help="sf0.1 per-query record to ratio against")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--fixture", default="/tmp/graft_sf1")
    ap.add_argument("--gate", type=float, default=15.0)
    args = ap.parse_args()

    ref = last_json_line(args.ref)
    ensure_fixture(args.fixture)
    sf1 = run_bench(args.fixture, "/tmp/bench_sf1_raw.json")

    ratios, violations = {}, []
    for q, t1 in sorted(sf1["queries"].items()):
        t0 = ref["queries"].get(q)
        if t0 is None or t0 <= 0 or t1 <= 0:
            continue  # new/failed query: no ratio, surfaced via failed[]
        r = t1 / t0
        ratios[q] = round(r, 2)
        if r > args.gate and t1 >= MIN_SECS:
            violations.append({"query": q, "sf01": round(t0, 3),
                               "sf1": round(t1, 3), "ratio": round(r, 2)})

    rnd = args.round if args.round is not None else next_round()
    out = {
        "metric": "sf1_scale_probe", "unit": "ratio", "emitter": "bench_sf1",
        "fixture": args.fixture, "gate": args.gate, "min_secs": MIN_SECS,
        "sf01_total": round(ref["value"], 2), "sf1_total": round(sf1["value"], 2),
        "total_ratio": round(sf1["value"] / ref["value"], 2),
        "n_queries": len(ratios),
        # guard the empty case (every query failed at sf1, or zero overlap
        # with the ref record): the failed-queries report below must still
        # print instead of dying on an IndexError here
        "median_ratio": (round(sorted(ratios.values())[len(ratios) // 2], 2)
                         if ratios else None),
        "worst": sorted(ratios.items(), key=lambda kv: -kv[1])[:10],
        "failed_at_sf1": sf1.get("failed", []),
        "violations": violations,
        "queries_sf1": {k: round(v, 3) for k, v in sorted(sf1["queries"].items())},
    }
    path = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[bench_sf1] total {ref['value']:.1f}s -> {sf1['value']:.1f}s "
          f"({out['total_ratio']}x on 10x data), median {out['median_ratio']}x, "
          f"wrote {path}")
    if sf1.get("failed"):
        print(f"[bench_sf1] FAILED QUERIES AT SF1: {sf1['failed']}")
        sys.exit(1)
    if violations:
        print(f"[bench_sf1] GATE VIOLATIONS (> {args.gate}x):")
        for v in violations:
            print(f"  {v['query']}: {v['sf01']}s -> {v['sf1']}s = {v['ratio']}x")
        sys.exit(1)
    print("[bench_sf1] gate clean")


if __name__ == "__main__":
    main()
