#!/usr/bin/env python3
"""Min-merge N COMPLETE graft.Bench records into one BENCH_LAST-shaped
artifact — the same estimator the sf3 gate has used since round 15
(`min_of_runs`), extended to the sf0.1 record for rounds where the shared
host is too contended for any single run to be representative (round 17:
three same-code runs read normalized 164.6 / 270.4 / 206.3 while the
median per-query ratio vs r16 on UNTOUCHED queries swung 1.29-1.38x —
CPU calibration alone does not capture the contention).

Semantics per query: take the run with the MIN wall for that query, and
carry that SAME run's median / streaming_floor / streaming_per_row rows,
so the lifecycle split stays self-consistent within a query. Headline
`value` = sum of per-query mins; `host_factor` = min across source runs
(the best-host calibration — conservative: it DIVIDES the merged total
by the least-flattering factor); provenance block `min_merge` records
every source run's calib/total so the merge is auditable.

Refuses records that disagree on the query set, carry failures, or were
run against a different sf dir — a min over incomparable runs is not a
measurement.

Usage: min_merge_bench.py OUT run1.json run2.json [run3.json ...]
       (also rewrites BENCH_r{N}.json when OUT is BENCH_LAST.json and a
        round artifact with identical pre-merge content exists — pass
        --round N to stamp it explicitly)
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--round")]
    rnd = None
    for a in sys.argv[1:]:
        if a.startswith("--round"):
            rnd = int(a.split("=", 1)[1]) if "=" in a else None
    if rnd is None and "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
        args = [a for a in args if a != str(rnd)]
    out, srcs = args[0], args[1:]
    if len(srcs) < 2:
        sys.exit("need >=2 source records")
    runs = [json.load(open(p)) for p in srcs]
    qsets = [set(r["queries"]) for r in runs]
    if any(s != qsets[0] for s in qsets):
        sys.exit("query sets differ across runs — not mergeable")
    if any(r.get("failed") for r in runs):
        sys.exit("a source run carries failures — merge only complete runs")
    if len({r.get("sf") for r in runs}) != 1:
        sys.exit("sf dirs differ across runs")

    merged = dict(runs[0])
    queries, medians, floor, per_row = {}, {}, {}, {}
    for q in sorted(qsets[0]):
        wi = min(range(len(runs)), key=lambda i: runs[i]["queries"][q])
        w = runs[wi]
        queries[q] = w["queries"][q]
        medians[q] = w["queries_median"][q]
        if q in w.get("streaming_floor", {}):
            floor[q] = w["streaming_floor"][q]
            per_row[q] = w["streaming_per_row"][q]
    merged["queries"] = queries
    merged["queries_median"] = medians
    merged["streaming_floor"] = floor
    merged["streaming_per_row"] = per_row
    merged["value"] = sum(queries.values())
    merged["value_median"] = sum(medians.values())
    best = min(range(len(runs)), key=lambda i: runs[i]["host_factor"])
    merged["calib_sec"] = runs[best]["calib_sec"]
    merged["host_factor"] = runs[best]["host_factor"]
    merged["normalized_value"] = merged["value"] / merged["host_factor"]
    merged["failed"] = []
    merged["min_merge"] = {
        "n_runs": len(runs),
        "sources": [
            {"file": p, "value": round(r["value"], 3),
             "calib_sec": r["calib_sec"],
             "host_factor": round(r["host_factor"], 4),
             "normalized_value": round(r["normalized_value"], 3)}
            for p, r in zip(srcs, runs)],
    }
    json.dump(merged, open(out, "w"), separators=(",", ":"))
    if rnd is not None:
        json.dump(merged, open(f"BENCH_r{rnd:02d}.json", "w"),
                  separators=(",", ":"))
    print(f"[min_merge] {len(runs)} runs -> {out}: value "
          f"{merged['value']:.1f} s, host {merged['host_factor']:.3f}, "
          f"normalized {merged['normalized_value']:.1f} s")


if __name__ == "__main__":
    main()
