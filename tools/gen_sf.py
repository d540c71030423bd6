"""Deterministic sf-scale testdata generator for scale sweeps.

Mirrors the schema and value distributions of the driver-generated
/root/testdata/sf* tables (inspected, not copied): TPC-H-ish star
schema + events + documents + embeddings. Used for the r12 sf1 sweep
(the driver only ships sf0.001/0.01/0.1). Relational tables and
events scale 10x over sf0.1; documents/embeddings scale 10x too
(raised from 4x in r15 — the scale-critical family deserves the same
axis; quadratic DuckDB oracles route through the prefix-filtered
replays in replay_oracles.py when needed).

Usage: python3 tools/gen_sf.py <outdir> [relational_scale] [doc_scale]
(scales are multipliers over the sf0.1 row counts)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1"
rs = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
ds = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(4242)

N_CUST = int(15000 * rs)
N_SUPP = int(1000 * rs)
N_PART = int(20000 * rs)
N_ORD = int(150000 * rs)
N_EV = int(100000 * rs)
N_USERS = int(1500 * rs)
N_DOC = int(5000 * ds)
N_EMB = int(2000 * ds)

DAY_US = 86400000000


def write(name, data, schema):
    pq.write_table(pa.table(data, schema=schema), f"{out}/{name}.parquet")
    print(name, "rows:", len(next(iter(data.values()))))


# region / nation: fixed dimension tables, same shape as the driver's
regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": regions},
      pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
write("nation", {
    "n_nationkey": np.arange(25, dtype=np.int32),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
    pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
               ("n_regionkey", pa.int32())]))

segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", {
    "c_custkey": np.arange(N_CUST, dtype=np.int64),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": [segs[i] for i in rng.integers(0, 5, N_CUST)]},
    pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
               ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
               ("c_mktsegment", pa.string())]))

write("supplier", {
    "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)},
    pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
               ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

adjs = ["large", "hot", "blue", "red", "green", "small", "dim", "plated"]
nouns = ["ring", "bolt", "gear", "tube", "cap", "disk", "rod", "pin"]
ptypes = ["LARGE", "STANDARD", "SMALL", "ECONOMY", "MEDIUM", "PROMO"]
pk = np.arange(N_PART)
write("part", {
    "p_partkey": pk.astype(np.int64),
    "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in pk],
    "p_brand": [f"Brand#{i % 25}" for i in pk],
    "p_type": [ptypes[i] for i in rng.integers(0, 6, N_PART)],
    "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
    "p_retailprice": np.round(900 + (pk % 1000) * 0.1, 2)},
    pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
               ("p_brand", pa.string()), ("p_type", pa.string()),
               ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

t95 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
span = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(
    "timedelta64[D]").astype(int)
statuses = ["O", "P", "F"]
prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
odate = t95 + rng.integers(0, span + 1, N_ORD) * DAY_US
write("orders", {
    "o_orderkey": np.arange(N_ORD, dtype=np.int64),
    "o_custkey": rng.integers(0, N_CUST, N_ORD).astype(np.int64),
    "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(900, 500000, N_ORD), 2),
    "o_orderdate": odate,
    "o_orderpriority": [prios[i] for i in rng.integers(0, 5, N_ORD)]},
    pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
               ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
               ("o_orderdate", pa.timestamp("us")),
               ("o_orderpriority", pa.string())]))

# lineitem: Poisson(4)-clamped lines per order, independent ship dates
cnt = np.maximum(1, rng.poisson(4.0, N_ORD))
ok = np.repeat(np.arange(N_ORD, dtype=np.int64), cnt)
n_li = len(ok)
ln = (np.concatenate([np.arange(c) for c in cnt]) + 1).astype(np.int32)
flags = ["A", "N", "R"]
lstat = ["O", "F"]
write("lineitem", {
    "l_orderkey": ok,
    "l_partkey": rng.integers(0, N_PART, n_li).astype(np.int64),
    "l_suppkey": rng.integers(0, N_SUPP, n_li).astype(np.int64),
    "l_linenumber": ln,
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
    "l_returnflag": [flags[i] for i in rng.integers(0, 3, n_li)],
    "l_linestatus": [lstat[i] for i in rng.integers(0, 2, n_li)],
    "l_shipdate": t95 + rng.integers(1, span + 96, n_li) * DAY_US},
    pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
               ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
               ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
               ("l_discount", pa.float64()), ("l_tax", pa.float64()),
               ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
               ("l_shipdate", pa.timestamp("us"))]))

t24 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
etypes = ["signup", "purchase", "view", "click", "error"]
write("events", {
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": t24 + rng.integers(0, 30 * DAY_US, N_EV),
    "user_id": rng.integers(0, N_USERS, N_EV).astype(np.int64),
    "event_type": [etypes[i] for i in rng.integers(0, 5, N_EV)],
    "value": np.round(rng.exponential(50.0, N_EV), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)]},
    pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
               ("user_id", pa.int64()), ("event_type", pa.string()),
               ("value", pa.float64()), ("props", pa.string())]))

# documents: 30-word vocabulary, zipf-free uniform sampling, ~2% exact
# duplicates and ~2% near duplicates (a few words swapped for 'dup')
vocab = np.array(("spark window merge table column vector stream value data "
                  "small join filter big group hash customer sort order slow "
                  "line part fast row the agg key query a scan batch").split())
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = [0.42, 0.15, 0.15, 0.14, 0.14]
texts = []
for i in range(N_DOC):
    nw = int(rng.integers(8, 101))
    texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
texts = np.array(texts, dtype=object)
n_dup = N_DOC // 50
dup_to = rng.integers(0, N_DOC - 2 * n_dup, n_dup)
texts[N_DOC - n_dup:] = texts[dup_to]  # exact duplicates
for j in range(n_dup):  # near duplicates: 2 words -> 'dup'
    src_words = texts[dup_to[j]].split()
    for p in rng.integers(0, len(src_words), 2):
        src_words[p] = "dup"
    texts[N_DOC - 2 * n_dup + j] = " ".join(src_words)
write("documents", {
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": list(texts),
    "lang": [langs[i] for i in rng.choice(5, N_DOC, p=lang_p)],
    "source": [f"src{i}" for i in rng.integers(0, 20, N_DOC)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
    pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
               ("lang", pa.string()), ("source", pa.string()),
               ("n_chars", pa.int64())]))

# embeddings: 10 unit-norm cluster centers + noise, renormalized.
# Cluster mass is ZIPF-skewed (p_k ∝ 1/(k+1): hot cluster ~34%, tail
# ~3%) and the hot cluster is DENSER (0.15 noise vs 0.25) — the
# SCALEPROBE_r14 skewed-corpus shape promoted into the standing sf1
# gate so IVF/PQ/kNN-graph run under quantizer skew every round, not
# just in one-off probes (r15 verdict task 6).
centers = rng.normal(size=(10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
zipf_p = 1.0 / np.arange(1, 11)
zipf_p /= zipf_p.sum()
label = rng.choice(10, N_EMB, p=zipf_p)
noise = np.where(label == 0, 0.15, 0.25)[:, None]
vecs = centers[label] + noise * rng.normal(size=(N_EMB, 64))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": [row.astype(np.float32) for row in vecs],
    "label": label.astype(np.int32)},
    pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
               ("label", pa.int32())]))
print("done:", out)
