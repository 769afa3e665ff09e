#!/usr/bin/env python
"""Synthesize a measurement-scale data directory matching the driver's
testdata distributions (observed on /root/testdata/sf0.1 — schemas,
cardinality ratios, dup rates, value ranges). Used ONLY to measure
optimization work at sf>=1.0 locally (the driver's round-end bench
generates its own sf1.0); never writes into /root/testdata.

Only the four tables the registry queries actually read are produced:
documents, embeddings, events, orders (grep `_t(spark, sf_dir, ...)`).

Usage: python BENCH/gen_sf.py SF OUTDIR      e.g. 1.0 /dev/shm/sfgen/sf1.0
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "value", "vector", "window", "zone",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    texts = []
    for i in range(n):
        if i > 0 and rng.random() < 0.0032:  # exact-dup rate seen at sf0.1
            texts.append(texts[rng.integers(0, i)])
            continue
        k = int(rng.integers(10, 101))
        texts.append(" ".join(rng.choice(VOCAB, size=k).tolist()))
    doc_id = np.arange(n, dtype=np.int64)
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in range(n)])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table({
        "doc_id": doc_id, "text": texts, "lang": lang,
        "source": source, "n_chars": n_chars,
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(v.astype(np.float32).tolist(),
                              type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, size=n).astype(np.int32),
    })


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    n_users = max(1, int(n * 0.015))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    offs = np.sort(rng.integers(0, int(span / np.timedelta64(1, "us")), size=n))
    ts = base + offs.astype("timedelta64[us]")
    types = rng.choice(["signup", "click", "view", "purchase", "error"], size=n)
    k = rng.integers(0, 100, size=n)
    props = np.array([f'{{"k": {x}}}' for x in k])
    return pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(ts),
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": types,
        "value": np.round(rng.random(size=n) * 560.0, 2),
        "props": props,
    })


def gen_orders(rng: np.random.Generator, n: int) -> pa.Table:
    n_cust = max(1, int(n * 0.1))
    day0 = np.datetime64("1995-01-01", "us")
    days = rng.integers(0, 2405, size=n)
    return pa.table({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, size=n).astype(np.int64),
        "o_orderstatus": rng.choice(["P", "O", "F"], size=n),
        "o_totalprice": np.round(1000 + rng.random(size=n) * 499000.0, 2),
        "o_orderdate": pa.array(day0 + (days * 86400 * 1_000_000)
                                .astype("timedelta64[us]")),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            size=n),
    })


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    tables = {
        "documents": gen_documents(rng, int(50_000 * sf)),
        "embeddings": gen_embeddings(rng, int(20_000 * sf)),
        "events": gen_events(rng, int(1_000_000 * sf)),
        "orders": gen_orders(rng, int(1_500_000 * sf)),
    }
    for name, t in tables.items():
        pq.write_table(t, f"{out}/{name}.parquet", row_group_size=200_000)
        print(name, t.num_rows)


if __name__ == "__main__":
    main()
