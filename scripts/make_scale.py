#!/usr/bin/env python3
"""Generate a local sf~1 dataset (10x sf0.1) mirroring the driver testdata's
schemas and distributions, for the SURVEY §11 scale-curve check (test
tooling only; the engine itself never uses Python).

/root/testdata ships sf0.001/0.01/0.1 only, so every 100 TB claim rests on
plan shape. This synthesizes a 10x-larger set at matching distributions
(same 31-word vocabulary, doc-length range, dup rate, user/order/part
cardinality ratios, timestamp types incl. the ns `events.ts`) so the slow
catalog queries can be measured at two scale points and their cost curves
compared. NOT oracle data — cost curves only.

Writes to /root/repo/scale_sf1/ (gitignored). Deterministic, seed 4242.

--mult M scales every table M x beyond the sf~1 base (so --mult 4 is a
40x-sf0.1 fixture, for the round-9 superlinearity probe on the slowest
BENCH10 rows). The l_suppkey range intentionally stays fixed: the co-share
pair key space is a property of the supplier catalog, not of volume, so
pair DENSITY grows with M the way a real marketplace's would.
"""
import argparse
import json
from pathlib import Path

ap = argparse.ArgumentParser()
ap.add_argument("--mult", type=int, default=1,
                help="multiplier on the sf~1 (10x sf0.1) base sizes")
ap.add_argument("--out", default=None,
                help="output dir (default scale_sf1 for mult=1, scale_sf{mult} otherwise)")
ap.add_argument("--seed", type=int, default=4242)
args = ap.parse_args()
M = args.mult

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / (
    args.out if args.out else ("scale_sf1" if M == 1 else f"scale_sf{M}"))
OUT.mkdir(exist_ok=True)
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(args.seed)

con = duckdb.connect()
vocab = [r[0] for r in con.sql(
    f"SELECT DISTINCT unnest(string_split(text,' ')) AS w "
    f"FROM '{SRC}/documents.parquet' ORDER BY w").fetchall()]
assert len(vocab) > 0

# ---- documents: 50k docs, same vocab, uniform 10-100 words, ~0.16% dups
N_DOC = 50_000 * M
n_words = rng.integers(10, 101, N_DOC)
texts = [" ".join(rng.choice(vocab, k)) for k in n_words]
# exact duplicates at the sf0.1 rate (8/5000)
for i in rng.choice(N_DOC, 80 * M, replace=False):
    texts[i] = texts[int(rng.integers(0, N_DOC))]
langs = rng.choice(["en", "de", "zh", "fr", "es"], N_DOC,
                   p=[0.412, 0.147, 0.147, 0.147, 0.147])
sources = np.array([f"src{i}" for i in rng.integers(0, 20, N_DOC)])
pq.write_table(pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": langs,
    "source": sources,
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), OUT / "documents.parquet")

# ---- embeddings: 20k unit-norm 64-dim float32, labels 0..9
N_EMB = 20_000 * M
v = rng.standard_normal((N_EMB, 64)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(v.ravel(), pa.float32()), 64).cast(pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
}), OUT / "embeddings.parquet")

# ---- events: 1M rows, 15k users, 30-day span, ns timestamps
N_EV = 1_000_000 * M
ts0 = np.datetime64("2024-01-01T00:00:00", "ns")
span_ns = 30 * 24 * 3600 * 10**9
ts = ts0 + np.sort(rng.integers(0, span_ns, N_EV)).astype("timedelta64[ns]")
pq.write_table(pa.table({
    "event_id": pa.array(range(N_EV), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, 15_000 * M, N_EV), pa.int64()),
    "event_type": rng.choice(
        ["view", "click", "purchase", "signup", "error"], N_EV),
    "value": np.round(np.clip(rng.exponential(50.0, N_EV), 0, 1000), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EV)],
}), OUT / "events.parquet")

# ---- orders: 1.5M rows, 150k customers, ms timestamps
N_ORD = 1_500_000 * M
odate = (np.datetime64("1995-01-01", "ms")
         + rng.integers(0, 2404, N_ORD).astype("timedelta64[D]").astype(
             "timedelta64[ms]"))
pq.write_table(pa.table({
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, 150_000 * M, N_ORD), pa.int64()),
    "o_orderstatus": rng.choice(["O", "F", "P"], N_ORD),
    "o_totalprice": np.round(rng.uniform(1000, 500_000, N_ORD), 2),
    "o_orderdate": pa.array(odate, pa.timestamp("ms")),
    "o_orderpriority": rng.choice(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], N_ORD),
}), OUT / "orders.parquet")

# ---- lineitem: 6M rows over those orders, ms shipdate
N_LI = 6_000_000 * M
lok = rng.integers(0, N_ORD, N_LI)
ship = (np.datetime64("1995-01-02", "ms")
        + rng.integers(0, 2498, N_LI).astype("timedelta64[D]").astype(
            "timedelta64[ms]"))
pq.write_table(pa.table({
    "l_orderkey": pa.array(lok, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, 200_000 * M, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, 10_000, N_LI), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105_000, N_LI), 2),
    "l_discount": np.round(rng.uniform(0, 0.10, N_LI), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, N_LI), 2),
    "l_returnflag": rng.choice(["A", "N", "R"], N_LI),
    "l_linestatus": rng.choice(["F", "O"], N_LI),
    "l_shipdate": pa.array(ship, pa.timestamp("ms")),
}), OUT / "lineitem.parquet")

# ---- partsupp: the TPC-H table the driver fixture lacks (round-9 verdict
# stretch). 4 distinct suppliers per lineitem partkey (offsets mod the
# supplier key space), so the full Q2/Q20 forms (queries/PartsuppOps.scala)
# have a scale fixture to run their cost curves on. Keys span the LINEITEM
# key spaces (ps_partkey 0..200k*M, ps_suppkey 0..10k) — like lineitem
# itself, only the low keys also appear in the copied sf0.1 dims, which is
# the existing fixture discipline (cost curves, not oracle data).
N_PART_KEYS = 200_000 * M
N_SUPP_KEYS = 10_000
pk = np.repeat(np.arange(N_PART_KEYS, dtype=np.int64), 4)
off = np.tile(np.array([0, 2503, 5009, 7507], dtype=np.int64), N_PART_KEYS)
sk = (pk + off) % N_SUPP_KEYS
# own rng stream (seed+1): position-independent, so adding partsupp to an
# ALREADY-GENERATED fixture dir produces the same bytes as a full rerun
ps_rng = np.random.default_rng(args.seed + 1)
pq.write_table(pa.table({
    "ps_partkey": pa.array(pk, pa.int64()),
    "ps_suppkey": pa.array(sk, pa.int64()),
    "ps_availqty": pa.array(ps_rng.integers(1, 10_000, 4 * N_PART_KEYS),
                            pa.int32()),
    "ps_supplycost": np.round(
        ps_rng.uniform(1.0, 1000.0, 4 * N_PART_KEYS), 2),
}), OUT / "partsupp.parquet")

# small dims: copy from sf0.1 (the measured queries don't touch them, but a
# full catalog run shouldn't crash on a missing table)
import shutil
for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copy(f"{SRC}/{t}.parquet", OUT / f"{t}.parquet")

print("wrote", OUT)
for p in sorted(OUT.glob("*.parquet")):
    print(f"  {p.name:22s} {p.stat().st_size/1e6:8.1f} MB")
