#!/usr/bin/env python3
"""Generate COUNTS.md and sync the query/spec counts README.md and
COVERAGE.md cite — the in-round review sweeps' single most repeated
finding class has been stale hardcoded counts after a round adds queries
or specs; this makes the numbers derived from HEAD instead of remembered.

Counting is static and exact by construction of the source conventions:
  - oracle queries  = `-> ((s, dir)` bodies in Queries.scala (every query
    entry uses that literal shape);
  - oracle SQL rows = `"q..." ->` keys minus the query bodies (the two
    maps share key names; every key appears exactly once per map);
  - specs           = `test("` occurrences under src/test (no dynamic
    test registration in this repo — the static count has matched every
    judge-run `sbt test` total);
  - suites          = `class *Spec` definitions under src/test.

Usage:  python3 tools/counts.py          # regenerate + patch docs
        python3 tools/counts.py --check  # exit 1 if any doc drifted
"""
import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.path.join(REPO, "src/main/scala/graft/Queries.scala")
TESTS = os.path.join(REPO, "src/test")


def counts():
    src = open(QUERIES).read()
    queries = src.count("-> ((s, dir)")
    keys = len(re.findall(r'"q[a-z0-9_]+" ->', src))
    oracles = keys - queries
    tests = suites = 0
    for d, _, fs in os.walk(TESTS):
        for f in fs:
            if f.endswith(".scala"):
                body = open(os.path.join(d, f)).read()
                # anchored at line start: a bare substring count matches
                # identifiers that merely END in "test", e.g. latest("x")
                tests += len(re.findall(r'^\s*test\("', body, re.M))
                suites += len(re.findall(
                    r"(?<!abstract )class \w+Spec extends", body))
    return {"queries": queries, "oracles": oracles,
            "tests": tests, "suites": suites}


# (path, regex, replacement-template) — every place a count is cited.
# Adding a new citation site? Cite COUNTS.md instead, or add a rule here.
def rules(c):
    q, t, s = c["queries"], c["tests"], c["suites"]
    return [
        ("README.md", r"\d+ named queries", f"{q} named queries"),
        ("README.md", r"ALL \d+ queries", f"ALL {q} queries"),
        ("README.md", r"`sbt test`: \d+ specs", f"`sbt test`: {t} specs"),
        ("README.md", r"across all \d+ queries", f"across all {q} queries"),
        ("README.md", r"all \d+ hash-match", f"all {q} hash-match"),
        ("COVERAGE.md", r"ALL \d+ queries", f"ALL {q} queries"),
        ("COVERAGE.md", r"ScalaTest \(\d+ tests", f"ScalaTest ({t} tests"),
        ("COUNTS.md", r"(?s).*", None),  # fully generated, see below
    ]


def counts_md(c):
    return f"""# COUNTS (generated — do not edit)

Regenerate with `python3 tools/counts.py` (run it whenever a query or
spec lands; `--check` fails if any cited count drifted from HEAD).

- **{c['queries']}** oracle queries in `SparkEntry.queries`, each with a
  DuckDB `oracleSql` entry (**{c['oracles']}** — the driver hash-gates
  every one at sf0.01)
- **{c['tests']}** ScalaTest specs across **{c['suites']}** suites
  (`sbt test`)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    c = counts()
    assert c["oracles"] == c["queries"], \
        f"every query needs an oracleSql entry: {c}"
    drift = []
    for path, pat, repl in rules(c):
        full = os.path.join(REPO, path)
        want = counts_md(c) if path == "COUNTS.md" else None
        old = open(full).read() if os.path.exists(full) else ""
        if path == "COUNTS.md":
            new = want
        else:
            new, n = re.subn(pat, repl, old)
            if n == 0:
                print(f"[counts] WARNING: no match for {pat!r} in {path} "
                      "(citation site moved? update tools/counts.py)")
        if new != old:
            drift.append(path)
            if not args.check:
                open(full, "w").write(new)
    print(f"[counts] {c['queries']} queries / {c['oracles']} oracles / "
          f"{c['tests']} specs in {c['suites']} suites"
          + (f"; updated {sorted(set(drift))}" if drift else "; docs in sync"))
    if args.check and drift:
        sys.exit(f"[counts] DRIFT in {sorted(set(drift))} — "
                 "run tools/counts.py")


if __name__ == "__main__":
    main()
