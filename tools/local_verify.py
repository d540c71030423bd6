#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
first (sbt "runMain graft.Verify <sfDir> <outDir>"), then this script
compares each query's parquet dump against its DuckDB oracle.

Comparison mirrors the documented driver behavior: sort columns by
name, sort rows, compare row counts, schemas (loosely), and values.
"""
import json
import sys
import glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = f.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(glob.glob(f"{out_dir}/{name}/*.parquet")[0])
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    a = a.astype(float).round(9)
                    b = b.astype(float).round(9)
                    eq = (a.fillna(-9e99) == b.fillna(-9e99)).all()
                else:
                    eq = (a.astype(str).fillna("<NA>") == b.astype(str).fillna("<NA>")).all()
            except Exception as e:
                eq = False
            if not eq:
                bad = (a.astype(str) != b.astype(str))
                i = bad.idxmax() if bad.any() else 0
                mismatch = f"col {c} differs, e.g. row {i}: {g[c].iloc[i]!r} vs {w[c].iloc[i]!r} (dtypes {g[c].dtype}/{w[c].dtype})"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = d.split("/")[-1]
        if name in oracle:
            continue
        try:
            got = pd.read_parquet(glob.glob(f"{d}/*.parquet")[0])
            status = "PASS" if len(got) > 0 else "FAIL (0 rows)"
            print(f"{status} {name} [rows-only] ({len(got)} rows)")
            if len(got) == 0:
                n_fail += 1
            else:
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name} [rows-only]: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
