import duckdb, json, glob, os, hashlib, sys
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out_r6"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        odf = con.execute(sql).fetchdf()
        # driver compare: sort columns by name, sort rows, hash values
        def norm(df):
            df = df[sorted(df.columns)]
            df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
            return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
        ok_hash = norm(sdf) == norm(odf) if ok_rows and ok_schema else False
        status = "OK" if (ok_rows and ok_schema and ok_hash) else f"FAIL rows={ok_rows}({len(sdf)}/{len(odf)}) schema={ok_schema} hash={ok_hash}"
        if not (ok_rows and ok_schema and ok_hash): fails.append(name)
        print(f"{name}: {status}")
    except Exception as e:
        fails.append(name); print(f"{name}: ERROR {e}")
print(("ALL OK" if not fails else f"FAILED: {fails}"))
