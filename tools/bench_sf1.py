#!/usr/bin/env python3
"""BENCH_SF1 mode: the full-suite sf1 scale probe as a GATED number, not a
narrative. Generates the organic sf1 fixture if absent (tools/make_sf1.py),
runs graft.Bench against it, computes per-query wall ratios vs the sf0.1
record, and FAILS LOUDLY (exit 1) if any ratio exceeds the gate — so a
regression in a scale-sensitive query (q33/q34/q101...) is caught by a
number the moment it lands.

Usage:
    python3 tools/bench_sf1.py [--ref BENCH_LAST.json] [--round N]
                               [--fixture /tmp/graft_sf1] [--gate 12.0]
                               [--per-row-gate 15.0]

Writes BENCH_SF1_r{N}.json: {sf01, sf1, ratios, gate, violations, totals,
streaming per-row split + its own gate}.

Gate rationale (from the recorded probes, BENCH_NOTES rounds 7-13): the
organic-10x decade lands a median per-query ratio ~1.5-1.9x and a worst
~9-10x (pool-saturating per-row kernels: image decode, quality regex,
shingling). The wall gate started at 15x; round 14 tightened it to 12x
after the worst observed ratio held <=10.2x for four consecutive rounds —
anything beyond it has historically meant superlinear work (the round-7
replica-amplified pair explosions), which is exactly what the gate exists
to catch. Queries under MIN_SECS at sf1 are exempt: a 0.1->1.6s swing is
scheduler jitter, not scaling.

Streaming per-row gate (round 14): the streaming queries' wall is 50-90%
fixed micro-batch lifecycle floor (measured per run, `streaming_floor` in
the bench JSON), so a state-store misconfiguration could regress the
per-row half several-fold while hiding inside the wall gate. This mode now
ALSO gates sf1 per-row <= 15x sf0.1 per-row (per-row = median - floor,
both measured on the same host/run), exempting per-row halves under
PER_ROW_MIN_SECS at sf1 where lifecycle jitter dominates the subtraction.

Denominator noise floor: the sf0.1 per-row half is a SUBTRACTION of two
~2-8s lifecycle-dominated measurements, so it carries ~+/-0.5s noise and
can legitimately clamp to 0.0 (the kill-and-resume variants, whose kill
point races the first batch). A sub-second denominator would turn that
noise into a 20-60x "ratio" (observed in the first r14 run: q116b read
22x while its sf1 per-row, 11.6s, matched its non-resume twin q116's
12.2s - identical engine behavior, half-size denominator). The gate
therefore ratios against max(sf01_per_row, PER_ROW_NOISE_FLOOR=1.0s):
a violation means >= 15s of genuine per-row growth at sf1 against a
clean sf0.1 - the state-store blow-up shape - never subtraction noise.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_SECS = 2.0  # sf1 wall below this can't meaningfully violate the gate
PER_ROW_MIN_SECS = 1.0        # sf1 per-row below this is subtraction jitter
PER_ROW_NOISE_FLOOR = 1.0     # sf0.1 per-row measurement noise (see docstring)


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
    ap.add_argument("--gate", type=float, default=12.0)
    ap.add_argument("--per-row-gate", type=float, default=15.0,
                    dest="per_row_gate")
    ap.add_argument("--raw", default=None,
                    help="recompute the gate from an existing raw bench "
                         "JSON (same HEAD) instead of re-running the suite")
    args = ap.parse_args()

    ref = last_json_line(args.ref)
    raw_provenance = None
    if args.raw:
        print(f"[bench_sf1] recomputing gate from {args.raw} (no re-run)")
        sf1 = last_json_line(args.raw)
        # Provenance validation: --raw mints a ROUND artifact from a file
        # it didn't produce, so a stale or wrong-fixture raw JSON would
        # silently become the recorded gate verdict. Refuse a raw run on
        # the wrong fixture, warn loudly when the per-row split is absent
        # (the per-row gate would read as vacuously clean), and stamp the
        # raw file's path/mtime + the recompute HEAD into the artifact so
        # a recomputed round is always distinguishable from a fresh run.
        raw_sf = sf1.get("sf")
        # realpath both sides: a trailing slash, relative form, or symlink
        # must not refuse a genuinely matching raw run
        if os.path.realpath(raw_sf or "") != os.path.realpath(args.fixture):
            sys.exit(f"[bench_sf1] REFUSING --raw: its sf fixture is "
                     f"{raw_sf!r}, expected {args.fixture!r} (pass --fixture "
                     f"to override if intentional)")
        if not sf1.get("streaming_per_row"):
            print("[bench_sf1] WARNING: --raw carries no streaming_per_row "
                  "split - the per-row gate below is vacuous for this run")
        try:
            head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                  capture_output=True, text=True,
                                  check=True).stdout.strip()
        except Exception:
            head = None
        raw_provenance = {
            "raw_path": os.path.abspath(args.raw),
            "raw_mtime": int(os.path.getmtime(args.raw)),
            "recompute_head": head,
        }
    else:
        ensure_fixture(args.fixture)
        sf1 = run_bench(args.fixture, "/tmp/bench_sf1_raw.json")

    # MIN-MERGE with an existing same-round artifact (same fixture): the
    # standard min-of-N noise rejection, applied ACROSS runs — a noisy
    # re-run can never overwrite a chosen clean record (the r15 failure
    # class: a violating re-run replaced the clean artifact while the
    # prose kept claiming "gate clean"), and the streaming per-row halves
    # gate on the min of every recorded run (their sf1 subtraction noise
    # is proportionally larger than at sf0.1). A different fixture path
    # refuses; --round N selects which artifact merges.
    rnd = args.round if args.round is not None else next_round()
    path = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
    min_of_runs = 1
    if os.path.exists(path):
        prev = json.load(open(path))
        if os.path.realpath(prev.get("fixture", "")) != \
                os.path.realpath(args.fixture):
            sys.exit(f"[bench_sf1] REFUSING to merge into {path}: its "
                     f"fixture is {prev.get('fixture')!r}, this run used "
                     f"{args.fixture!r} (pass a different --round)")
        pq = prev.get("queries_sf1", {})
        sf1["queries"] = {q: min(t, pq.get(q, t))
                         for q, t in sf1["queries"].items()}
        ppr = prev.get("streaming_per_row_sf1", {})
        sf1["streaming_per_row"] = {
            q: min(t, ppr.get(q, t))
            for q, t in sf1.get("streaming_per_row", {}).items()}
        sf1["value"] = sum(sf1["queries"].values())
        min_of_runs = prev.get("min_of_runs", 1) + 1
        print(f"[bench_sf1] min-merged into existing {os.path.basename(path)}"
              f" (now min over {min_of_runs} runs)")

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

    # streaming per-row gate: both runs carry a same-host floor split;
    # ratio the per-row halves. A query probed at sf1 but absent from the
    # ref record (new query, or a pre-r14 ref without the split) cannot
    # be ratioed — record it in streaming_per_row_unratioed and say so,
    # instead of silently passing it through a "clean" gate.
    pr_ratios, pr_violations, pr_unratioed = {}, [], []
    ref_pr = ref.get("streaming_per_row", {})
    for q, p1 in sorted(sf1.get("streaming_per_row", {}).items()):
        p0 = ref_pr.get(q)
        if p0 is None:
            pr_unratioed.append(q)
            continue
        r = p1 / max(p0, PER_ROW_NOISE_FLOOR)
        pr_ratios[q] = round(r, 2)
        if r > args.per_row_gate and p1 >= PER_ROW_MIN_SECS:
            pr_violations.append({"query": q, "sf01_per_row": round(p0, 3),
                                  "sf1_per_row": round(p1, 3),
                                  "ratio": round(r, 2)})
    if pr_unratioed:
        print(f"[bench_sf1] note: no sf0.1 per-row reference for "
              f"{pr_unratioed} - their per-row halves are NOT gated this run")

    out = {
        "metric": "sf1_scale_probe", "unit": "ratio", "emitter": "bench_sf1",
        "fixture": args.fixture, "gate": args.gate, "min_secs": MIN_SECS,
        "min_of_runs": min_of_runs,
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
        "per_row_gate": args.per_row_gate, "per_row_min_secs": PER_ROW_MIN_SECS,
        "per_row_noise_floor": PER_ROW_NOISE_FLOOR,
        "streaming_per_row_sf01": {k: round(v, 3) for k, v in sorted(ref_pr.items())},
        "streaming_per_row_sf1": {k: round(v, 3) for k, v in
                                  sorted(sf1.get("streaming_per_row", {}).items())},
        "streaming_per_row_ratios": pr_ratios,
        "streaming_per_row_unratioed": pr_unratioed,
        "streaming_floor_skipped_sf01": ref.get("streaming_floor_skipped", []),
        "streaming_floor_skipped_sf1": sf1.get("streaming_floor_skipped", []),
        "per_row_violations": pr_violations,
        "queries_sf1": {k: round(v, 3) for k, v in sorted(sf1["queries"].items())},
    }
    if raw_provenance:
        out["recomputed_from_raw"] = raw_provenance
    path = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[bench_sf1] total {ref['value']:.1f}s -> {sf1['value']:.1f}s "
          f"({out['total_ratio']}x on 10x data), median {out['median_ratio']}x, "
          f"wrote {path}")
    if sf1.get("failed"):
        print(f"[bench_sf1] FAILED QUERIES AT SF1: {sf1['failed']}")
        sys.exit(1)
    # print EVERY violation block before exiting: a run tripping both
    # gates must not hide the second behind the first (the sf1 suite is
    # too expensive to discover violations one re-run at a time)
    if violations:
        print(f"[bench_sf1] GATE VIOLATIONS (> {args.gate}x):")
        for v in violations:
            print(f"  {v['query']}: {v['sf01']}s -> {v['sf1']}s = {v['ratio']}x")
    if pr_violations:
        print(f"[bench_sf1] STREAMING PER-ROW GATE VIOLATIONS "
              f"(> {args.per_row_gate}x):")
        for v in pr_violations:
            print(f"  {v['query']}: {v['sf01_per_row']}s -> "
                  f"{v['sf1_per_row']}s = {v['ratio']}x")
    if violations or pr_violations:
        sys.exit(1)
    print("[bench_sf1] gate clean (wall + streaming per-row)")


if __name__ == "__main__":
    main()
