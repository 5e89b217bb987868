#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Verify parquet output, sort columns by
name, and compare row/schema/values. Usage:
    python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob, os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/q*"))
    for name in names:
        mine = pd.read_parquet(f"{outdir}/{name}")
        if name not in oracle:
            print(f"{name}: ROWS-ONLY rows={len(mine)}")
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        mine_c, ref_c = canon(mine), canon(ref)
        if list(mine_c.columns) != list(ref_c.columns):
            print(f"{name}: SCHEMA-MISMATCH mine={list(mine_c.columns)} ref={list(ref_c.columns)}")
            n_fail += 1
            continue
        if len(mine_c) != len(ref_c):
            print(f"{name}: ROWCOUNT-MISMATCH mine={len(mine_c)} ref={len(ref_c)}")
            n_fail += 1
            continue
        bad = None
        for c in mine_c.columns:
            mv, rv = mine_c[c].tolist(), ref_c[c].tolist()
            for i, (a, b) in enumerate(zip(mv, rv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"{name}: VALUE-MISMATCH col={c} row={i} mine={a!r} ref={b!r}")
            n_fail += 1
        else:
            print(f"{name}: OK rows={len(mine_c)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
