"""Deterministic schema-matched test-data generator for decades the
driver does not ship.

The driver generates ``/root/testdata/sf{0.001,0.01,0.1}``; the sf1
oracle sweep (VERDICT r10 item 2) needs a 10x decade.  This generator
writes the same ten tables with byte-identical arrow schemas
(verified against ``pyarrow.parquet.read_schema`` of the driver
files) and the same value distributions measured from sf0.1:

- row counts scale linearly from the sf0.1 measurements
  (lineitem 6M/sf, orders 1.5M/sf, customer 150k/sf, events 1M/sf
  over the same 30-day window, users 15k/sf, documents 500k*sf/10,
  embeddings 200k*sf/10); nation/region stay fixed.
- events: ``ts`` sorted by event_id (matches driver), value ~
  Exp(mean 50) rounded to 2dp, props always ``{"k": <0..99>}``.
- lineitem columns are independent draws (measured corr ~0 between
  extendedprice/quantity and orders.totalprice/line sums), quantity
  integral 1..50, discount 0..0.10 step .01, tax 0..0.08 step .01.
- documents: space-joined lowercase tokens, 10..100 tokens/doc,
  n_chars == len(text); lang 40% en + 15% each de/zh/fr/es; source
  doc_id % 20.  The vocabulary is widened (200 words vs the driver's
  31) so the background token-trigram collision rate stays sub-
  quadratic at 50k docs, and dedup structure is planted explicitly
  instead: ~0.3% exact-dup texts and ~0.6% near-dups (ONE token
  replaced in a >=60-token source doc, trigram-shingle Jaccard
  >= (L-5)/(L+1) ~ 0.90 — inside the engine's 16x4 LSH band
  layout's ~1-4e-8 recall zone, so the minhash row checks the
  designed outputs-coincide contract rather than the probabilistic
  gray zone below ~J 0.8 where LSH recall is genuinely partial).
- embeddings: 64-dim standard-normal float32 with random labels —
  measured from the driver's sf0.1 file, intra-label cosine is
  statistically identical to random-pair cosine (mean 0.007 vs
  0.004, p90 0.165 ≈ the 1/sqrt(64) random spread), i.e. labels
  carry almost no geometry; near-dup structure is PLANTED (~1%
  copy + sigma 0.005 noise).  A first draft used tight gaussian
  clusters (intra cos ~0.92): above the neardup threshold that
  made every same-cluster pair a true pair — 20M output rows and a
  562 s quadratic-output query at sf1.  Matching the driver's
  near-orthogonal geometry keeps cosine-threshold outputs linear
  in the planted mass, like the real corpus.

Correctness use only: the sweep compares Spark vs DuckDB on the SAME
files, so provenance does not matter -- but distribution fidelity
keeps the plans (skew, selectivity, session gaps) representative.

Usage: python tools/gen_testdata.py SF OUTDIR   (e.g. 1 .testdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDER_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJ = [
    "large", "hot", "cold", "small", "red", "green", "blue", "dim",
    "bright", "plain",
]
PART_NOUN = ["ring", "bolt", "nut", "cam", "gear", "rod", "pin", "cap"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

# 200 lowercase words: the driver's 31 spark-ish tokens plus filler.
_BASE_VOCAB = (
    "batch part spark line column order small sort fast value scan "
    "vector query agg table hash key group stream filter customer "
    "slow join shuffle stage task plan merge read write cache"
).split()
VOCAB = _BASE_VOCAB + [f"tok{i:03d}" for i in range(200 - len(_BASE_VOCAB))]


def _day_grain_ts(rng, n, lo, hi):
    lo = np.datetime64(lo)
    days = int((np.datetime64(hi) - lo) / np.timedelta64(1, "D"))
    return (lo + rng.integers(0, days + 1, n) * np.timedelta64(1, "D")).astype(
        "datetime64[us]"
    )


def gen(sf: float, out: str, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n = {
        "customer": max(150, int(1_500_000 * sf / 10)),
        "supplier": max(10, int(100_000 * sf / 10)),
        "part": max(200, int(2_000_000 * sf / 10)),
        "orders": max(1500, int(15_000_000 * sf / 10)),
        "lineitem": max(6000, int(60_000_000 * sf / 10)),
        "events": max(1000, int(10_000_000 * sf / 10)),
        "users": max(150, int(150_000 * sf / 10)),
        "documents": max(500, int(500_000 * sf / 10)),
        "embeddings": max(500, int(200_000 * sf / 10)),
    }

    def write(name, table):
        pq.write_table(
            table, os.path.join(out, f"{name}.parquet"),
            row_group_size=1_000_000,
        )

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    k = n["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(k), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(k)],
        "s_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
    }))

    k = n["customer"]
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(k), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(k)],
        "c_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
        "c_mktsegment": np.array(MKTSEGMENTS)[rng.integers(0, 5, k)],
    }))

    k = n["part"]
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), k)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), k)]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(k), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, k)],
        "p_type": np.array(PART_TYPES)[rng.integers(0, 6, k)],
        "p_size": pa.array(rng.integers(1, 51, k), pa.int32()),
        # matches the driver's 900.0..999.9 tenth-grain band
        "p_retailprice": 900.0 + (np.arange(k) % 1000) / 10.0,
    }))

    k = n["orders"]
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(k), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n["customer"], k), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, k)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, k), 2),
        "o_orderdate": _day_grain_ts(rng, k, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(ORDER_PRIORITIES)[rng.integers(0, 5, k)],
    }))

    k = n["lineitem"]
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n["orders"], k), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n["part"], k), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n["supplier"], k), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, k), pa.int32()),
        "l_quantity": rng.integers(1, 51, k).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
        "l_discount": rng.integers(0, 11, k) / 100.0,
        "l_tax": rng.integers(0, 9, k) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, k)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, k)],
        "l_shipdate": _day_grain_ts(rng, k, "1995-01-02", "2001-11-04"),
    }))

    k = n["events"]
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, k))
    ts = np.datetime64("2024-01-01") + ts * np.timedelta64(1, "us")
    write("events", pa.table({
        "event_id": pa.array(np.arange(k), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n["users"], k), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, k)],
        "value": np.round(rng.exponential(50.0, k), 2),
        "props": [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, k)],
    }))

    k = n["documents"]
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, k)
    texts: list[str] = []
    long_ids: list[int] = []  # near-dup sources must be >=60 tokens
    for i in range(k):
        toks = vocab[rng.integers(0, len(vocab), lens[i])]
        if i > 100 and rng.random() < 0.003:  # planted exact dup
            texts.append(texts[int(rng.integers(0, i))])
        elif long_ids and rng.random() < 0.006:  # planted near-dup
            src = texts[long_ids[int(rng.integers(0, len(long_ids)))]].split(" ")
            j = int(rng.integers(0, len(src)))
            src[j] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(toks))
        if len(texts[-1].split(" ")) >= 60:
            long_ids.append(i)
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(k), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, k, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(k)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    k = n["embeddings"]
    labels = rng.integers(0, 10, k)
    vecs = rng.normal(0, 1, (k, 64))
    dup_at = np.where((np.arange(k) > 100) & (rng.random(k) < 0.01))[0]
    for i in dup_at:  # planted near-dup vectors for cosine queries
        src = int(rng.integers(0, i))
        vecs[i] = vecs[src] + rng.normal(0, 0.005, 64)
        labels[i] = labels[src]
    vecs32 = vecs.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs32.ravel(), pa.float32()), 64
    ).cast(pa.list_(pa.float32()))
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(k), pa.int64()),
        "embedding": emb,
        "label": pa.array(labels, pa.int32()),
    }))
    return n


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    counts = gen(sf, out)
    print(json.dumps({"sf": sf, "out": out, "rows": counts}))
