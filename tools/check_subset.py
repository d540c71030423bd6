"""check_oracle.py over an explicit comma-separated query subset.

Usage: python3 tools/check_subset.py <outDir> <sfDir> <names.txt|csv>
Same driver-faithful compare (sorted columns, sorted rows, %.6f md5).
"""
import duckdb, json, os, hashlib, sys

out, sf, namearg = sys.argv[1], sys.argv[2], sys.argv[3]
names = open(namearg).read().strip().split(",") if os.path.exists(namearg) else namearg.split(",")
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
fails = []
for name in names:
    if name not in oracle:
        print(f"{name}: NO_ORACLE")
        continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
        def norm(df):
            df = df[sorted(df.columns)]
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
            return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
        ok_hash = norm(sdf) == norm(odf) if ok_rows and ok_schema else False
        status = "OK" if (ok_rows and ok_schema and ok_hash) else \
            f"FAIL rows={ok_rows}({len(sdf)}/{len(odf)}) schema={ok_schema} hash={ok_hash}"
        if status != "OK":
            fails.append(name)
        print(f"{name}: {status}", flush=True)
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {e}", flush=True)
print(("ALL OK" if not fails else f"FAILED: {fails}"))
