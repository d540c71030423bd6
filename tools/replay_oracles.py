"""Semantics-equivalent oracle evaluations for the handful of queries
whose DuckDB oracle SQL is intractable at sf1 (recursive/iterative
CTEs that DuckDB re-inlines per reference — the r12 sweep measured
>79 GB of spill on q_pagerank — and the all-pairs jaccard joins that
are O(n^2) in documents).

Each replay evaluates the SAME oracle definition (the committed
oracle_sql.json text is the spec) through an equivalent engine:
 - pagerank / ppr / hits: the edge CTE runs in DuckDB (it is one hash
   join), the unrolled 3-iteration snapped arithmetic runs in numpy —
   identical formula, identical floor(x*1e9+0.5)/1e9 snap points.
 - entity resolution: the pair CTE runs in DuckDB (blocked
   jaro-winkler join), the transitive closure (the intractable
   recursive CTE) runs as a union-find over the pair set.
 - ngram jaccard / minhash pairs: exact 3-gram jaccard >= 0.7 pair
   enumeration via prefix-filtered candidate generation (PPJoin-style
   length/prefix bounds; Xiao et al. 2008) + exact set verification —
   the oracle's FROM sh a JOIN sh b predicate, evaluated without the
   n^2 scan.

Each function returns (ok: bool, detail: str). Spark's output is read
from <out_dir>/<name>/*.parquet, exactly what the driver compares.
"""
import glob
import math
import re

import numpy as np
import pandas as pd


def _spark_df(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        raise FileNotFoundError(f"no spark output for {name}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _snap9(x):
    return np.floor(x * 1e9 + 0.5) / 1e9


def _edges_cust_supp(con):
    """The shared edge CTE of q_pagerank/q_ppr/q_hits: distinct
    ('c'||custkey, 's'||suppkey) from orders x lineitem."""
    df = con.execute(
        "SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS dst "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    ).fetchdf()
    nodes = pd.unique(pd.concat([df["src"], df["dst"]], ignore_index=True))
    idx = {n: i for i, n in enumerate(nodes)}
    src = df["src"].map(idx).to_numpy()
    dst = df["dst"].map(idx).to_numpy()
    return nodes, idx, src, dst


def _compare_ranks(spark, replay_nodes, replay_vals, val_cols, detail_name):
    """spark: DataFrame with node + value column(s). replay_vals:
    dict col -> np.array aligned with replay_nodes."""
    if len(spark) != len(replay_nodes):
        return False, f"{detail_name}: rows {len(spark)} vs {len(replay_nodes)}"
    s = spark.set_index("node").sort_index()
    order = np.argsort(replay_nodes)
    rn = replay_nodes[order]
    if not (s.index.to_numpy() == rn).all():
        return False, f"{detail_name}: node sets differ"
    worst = 0.0
    ndiff = 0
    for c in val_cols:
        got = s[c].to_numpy()
        want = replay_vals[c][order]
        d = np.abs(got - want)
        worst = max(worst, float(d.max()) if len(d) else 0.0)
        ndiff += int((d > 0).sum())
    # the snap quantum is 1e-9: an engine-order difference can move a
    # value by at most one quantum at an exact .5 boundary
    if worst <= 1e-9 + 1e-15:
        tag = "exact" if ndiff == 0 else f"{ndiff} values within 1 snap ulp"
        return True, f"{detail_name}: ok ({tag}, {len(spark)} rows)"
    return False, f"{detail_name}: max diff {worst:.3e} over {ndiff} values"


def replay_pagerank(con, sf_dir, out_dir):
    nodes, idx, src, dst = _edges_cust_supp(con)
    n = float(len(nodes))
    deg = np.bincount(src, minlength=len(nodes)).astype(float)
    is_src = deg > 0
    rank = np.full(len(nodes), _snap9(1.0 / n))
    for _ in range(3):
        contrib = np.bincount(dst, weights=rank[src] / deg[src], minlength=len(nodes))
        dm = rank[~is_src].sum()
        rank = _snap9((1.0 - 0.85) / n + 0.85 * (contrib + dm / n))
    return _compare_ranks(_spark_df(out_dir, "q_pagerank"), nodes,
                          {"rank": rank}, ["rank"], "q_pagerank")


def replay_ppr(con, sf_dir, out_dir):
    nodes, idx, src, dst = _edges_cust_supp(con)
    seeds = con.execute(
        "SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node "
        "FROM supplier WHERE s_suppkey < 10").fetchdf()["node"]
    ns = float(len(seeds))
    p = np.zeros(len(nodes))
    for sdn in seeds:
        if sdn in idx:
            p[idx[sdn]] = _snap9(1.0 / ns)
    deg = np.bincount(src, minlength=len(nodes)).astype(float)
    is_src = deg > 0
    rank = p.copy()
    for _ in range(3):
        contrib = np.bincount(dst, weights=rank[src] / deg[src], minlength=len(nodes))
        dm = rank[~is_src].sum()
        rank = _snap9(0.15 * p + 0.85 * (contrib + dm * p))
    keep = rank > 0
    return _compare_ranks(_spark_df(out_dir, "q_ppr"), nodes[keep],
                          {"rank": rank[keep]}, ["rank"], "q_ppr")


def replay_hits(con, sf_dir, out_dir):
    nodes, idx, src, dst = _edges_cust_supp(con)
    m = len(nodes)
    # iteration 1: auth = normalized in-degree, hub = normalized sum of auth
    a = np.bincount(dst, minlength=m).astype(float)
    t = a.sum()
    auth = _snap9(a / t) if t > 0 else np.zeros(m)
    h = np.bincount(src, weights=auth[dst], minlength=m)
    t = h.sum()
    hub = _snap9(h / t) if t > 0 else np.zeros(m)
    # iteration 2
    a = np.bincount(dst, weights=hub[src], minlength=m)
    t = a.sum()
    auth = _snap9(a / t) if t > 0 else np.zeros(m)
    h = np.bincount(src, weights=auth[dst], minlength=m)
    t = h.sum()
    hub = _snap9(h / t) if t > 0 else np.zeros(m)
    return _compare_ranks(_spark_df(out_dir, "q_hits"), nodes,
                          {"hub": hub, "auth": auth}, ["hub", "auth"], "q_hits")


def _entity_clusters(con):
    """pr CTE in DuckDB (tractable: blocked join) + union-find closure
    (the recursive CTE DuckDB cannot evaluate at sf1)."""
    rec = con.execute(
        "SELECT p_partkey AS id, p_name || ' ' || CAST(p_partkey % 10 AS VARCHAR) AS name "
        "FROM part WHERE p_partkey % 4 = 0 AND p_partkey < 80000").fetchdf()
    pairs = con.execute(
        "WITH rec AS (SELECT p_partkey AS id, p_name || ' ' || CAST(p_partkey % 10 AS VARCHAR) AS name "
        "  FROM part WHERE p_partkey % 4 = 0 AND p_partkey < 80000) "
        "SELECT a.id AS src, b.id AS dst FROM rec a JOIN rec b "
        "ON left(a.name, 2) = left(b.name, 2) AND a.id < b.id "
        "WHERE floor(jaro_winkler_similarity(a.name, b.name) * 1e6 + 0.5) / 1e6 >= 0.95"
    ).fetchdf()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent.get(r, r)
        while parent.get(x, x) != x:
            parent[x], x = r, parent.get(x, x)
        return r

    for s, d in zip(pairs["src"], pairs["dst"]):
        ra, rb = find(int(s)), find(int(d))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = {int(i): find(int(i)) for i in rec["id"]}
    rec["cluster"] = rec["id"].map(cluster)
    return rec


def _compare_entity(spark, rec, with_canonical, name):
    if len(spark) != len(rec):
        return False, f"{name}: rows {len(spark)} vs {len(rec)}"
    s = spark.sort_values("id").reset_index(drop=True)
    r = rec.sort_values("id").reset_index(drop=True)
    if not (s["id"].to_numpy() == r["id"].to_numpy()).all():
        return False, f"{name}: id sets differ"
    if not (s["cluster"].to_numpy() == r["cluster"].to_numpy()).all():
        bad = int((s["cluster"].to_numpy() != r["cluster"].to_numpy()).sum())
        return False, f"{name}: {bad} cluster assignments differ"
    if with_canonical:
        want = (r["cluster"] == r["id"]).astype(int).to_numpy()
        if not (s["is_canonical"].to_numpy() == want).all():
            return False, f"{name}: is_canonical differs"
    return True, f"{name}: ok (union-find closure, {len(rec)} records)"


def replay_entity_resolution(con, sf_dir, out_dir):
    rec = _entity_clusters(con)
    return _compare_entity(_spark_df(out_dir, "q_entity_resolution"), rec,
                           True, "q_entity_resolution")


def replay_stream_entity(con, sf_dir, out_dir):
    rec = _entity_clusters(con)
    return _compare_entity(_spark_df(out_dir, "q_stream_entity"), rec,
                           False, "q_stream_entity")


def _jaccard_pairs(con, threshold=0.7):
    """Exact 3-gram jaccard >= threshold pair set via prefix filtering.

    Identical semantics to the oracle SQL: tokens = lower(text) split
    on non-alnum runs ([^\\p{L}\\p{N}]+ == [^a-z0-9]+ for this ASCII
    corpus — asserted), shingles = distinct word 3-grams (whole doc if
    < 3 tokens), jaccard on the distinct-shingle sets. Prefix filter:
    order shingles by global frequency; two sets with jaccard >= t
    must intersect within their first len - ceil(t*len) + 1 rarest
    shingles, so only pairs sharing a prefix shingle are verified.
    """
    docs = con.execute("SELECT doc_id, lower(text) AS text FROM documents "
                       "WHERE text IS NOT NULL").fetchdf()
    assert con.execute(
        "SELECT count(*) FROM documents WHERE text ~ '[^\\x00-\\x7F]'"
    ).fetchone()[0] == 0, "non-ASCII corpus: replay tokenizer needs \\p classes"
    split = re.compile(r"[^a-z0-9]+")
    sets = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in split.split(text) if t]
        if not toks:
            continue
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        sets[int(did)] = sh
    freq = {}
    for sh in sets.values():
        for g in sh:
            freq[g] = freq.get(g, 0) + 1
    order = {g: (c, g) for g, c in freq.items()}  # rarest-first, id tiebreak
    index = {}
    prefixes = {}
    for did, sh in sets.items():
        ordered = sorted(sh, key=lambda g: order[g])
        plen = len(sh) - math.ceil(threshold * len(sh)) + 1
        prefixes[did] = ordered
        for g in ordered[:plen]:
            index.setdefault(g, []).append(did)
    cands = set()
    for g, ids in index.items():
        if len(ids) < 2:
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                cands.add((a, b) if a < b else (b, a))
    out = []
    for a, b in cands:
        sa, sb = sets[a], sets[b]
        la, lb = len(sa), len(sb)
        # length filter: jaccard >= t needs min/max >= t
        if min(la, lb) < threshold * max(la, lb):
            continue
        inter = len(sa & sb)
        j = inter / (la + lb - inter)
        if j >= threshold:
            out.append((a, b, math.floor(j * 1e6 + 0.5) / 1e6))
    return out, len(cands)


def _compare_pairs(spark, pairs, ncand, name):
    got = {(int(r.id_a), int(r.id_b)): float(r.jaccard)
           for r in spark.itertuples()}
    want = {(a, b): j for a, b, j in pairs}
    if got == want:
        return True, (f"{name}: ok (exact prefix-filtered replay, "
                      f"{len(want)} pairs from {ncand} candidates)")
    only_g = set(got) - set(want)
    only_w = set(want) - set(got)
    diff = {k for k in set(got) & set(want) if got[k] != want[k]}
    return False, (f"{name}: spark-only={len(only_g)} replay-only={len(only_w)} "
                   f"value-diff={len(diff)}")


_JACCARD_CACHE = {}


def _cached_jaccard(con):
    key = "pairs"
    if key not in _JACCARD_CACHE:
        _JACCARD_CACHE[key] = _jaccard_pairs(con)
    return _JACCARD_CACHE[key]


def replay_ngram_jaccard(con, sf_dir, out_dir):
    pairs, ncand = _cached_jaccard(con)
    return _compare_pairs(_spark_df(out_dir, "q_ngram_jaccard"), pairs, ncand,
                          "q_ngram_jaccard")


def replay_dedup_minhash(con, sf_dir, out_dir):
    pairs, ncand = _cached_jaccard(con)
    return _compare_pairs(_spark_df(out_dir, "q_dedup_minhash"), pairs, ncand,
                          "q_dedup_minhash")


def replay_dedup_all(con, sf_dir, out_dir):
    """q_dedup_all = exact-dup survivors minus near-dup losers.

    The oracle SQL embeds the FULL all-pairs 3-gram jaccard over the
    survivor set (~200M brute pairs at 20k docs — DuckDB times out at
    sf1); the survivor pair set is exactly the cached prefix-filtered
    pair set restricted to survivor x survivor, because survivors are
    a subset of documents with unchanged texts/shingles.
    """
    surv = {int(r[0]) for r in con.execute(
        "SELECT min(doc_id) FROM documents GROUP BY md5(text)").fetchall()}
    pairs, ncand = _cached_jaccard(con)
    dropped = {b for a, b, _ in pairs if a in surv and b in surv}
    want = surv - dropped
    got = {int(x) for x in _spark_df(out_dir, "q_dedup_all")["doc_id"]}
    if got == want:
        return True, (f"q_dedup_all: ok (exact-dup survivors {len(surv)} minus "
                      f"{len(dropped)} near-dup losers via the prefix-filtered "
                      f"pair set, {ncand} candidates)")
    return False, (f"q_dedup_all: spark-only={len(got - want)} "
                   f"replay-only={len(want - got)}")


REPLAYS = {
    "q_pagerank": replay_pagerank,
    "q_ppr": replay_ppr,
    "q_hits": replay_hits,
    "q_entity_resolution": replay_entity_resolution,
    "q_stream_entity": replay_stream_entity,
    "q_ngram_jaccard": replay_ngram_jaccard,
    "q_dedup_minhash": replay_dedup_minhash,
    "q_dedup_all": replay_dedup_all,
}
