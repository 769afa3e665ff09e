"""Web-corpus curation operators (operators/web.py): URL canonicalization
against hand-written expected forms, per-host quota determinism, and
contamination vs a brute-force Python oracle. The registry queries
(url_canonical_dedup / host_cap_sample / contamination_check) add the
DuckDB gate on the full documents table."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tapdata_connectors_spark.operators import web

CASES = [
    # (raw, canonical)
    ("https://example.com/a/b", "https://example.com/a/b"),
    ("HTTPS://WWW.EXAMPLE.COM/a/b", "https://example.com/a/b"),
    ("https://example.com:443/a/b", "https://example.com/a/b"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_a=1&utm_b=2", "https://example.com/a"),
    ("https://example.com/a?id=3&utm_a=1", "https://example.com/a?id=3"),
    ("https://example.com/a?utm_a=1&id=3", "https://example.com/a?id=3"),
    ("https://example.com/a?gclid=9&fbclid=8", "https://example.com/a"),
    # path/query case preserved; only scheme+host lowered
    ("HTTP://Example.COM/Path?Q=UPPER", "http://example.com/Path?Q=UPPER"),
    # no scheme: untouched apart from trailing cleanup
    ("not a url", "not a url"),
    ("https://www.sub.www.example.com/x", "https://sub.www.example.com/x"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "u string")
    got = [r["c"] for r in
           df.select(web.canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_host_of(spark):
    rows = [
        ("https://WWW.Example.com:8443/a", "example.com"),
        ("http://sub.example.org/x?y=1", "sub.example.org"),
        ("no-scheme/path", ""),
    ]
    df = spark.createDataFrame([(r,) for r, _ in rows], "u string")
    got = [r["h"] for r in
           df.select(web.host_of(F.col("u")).alias("h")).collect()]
    assert got == [h for _, h in rows]


def test_host_cap_sample_deterministic_and_capped(spark):
    docs = spark.createDataFrame(
        [(i, f"host{i % 3}") for i in range(50)], "doc_id long, source string")
    out = web.host_cap_sample(docs, cap=4).collect()
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r["source"], []).append(r)
    assert set(by_host) == {"host0", "host1", "host2"}
    for host, rows in by_host.items():
        assert len(rows) == 4 and sorted(r["rk"] for r in rows) == [1, 2, 3, 4]
        ids = {i for i in range(50) if f"host{i % 3}" == host}
        expect = sorted(ids, key=lambda i: (hashlib.md5(
            str(i).encode()).hexdigest(), i))[:4]
        got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert got == expect
    # stable across recomputation (no RNG anywhere)
    again = web.host_cap_sample(docs, cap=4).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_contamination_vs_python_oracle(spark):
    def grams(text, n=3):
        w = [t for t in text.lower().split() if t]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    eval_rows = [(100, "the quick brown fox jumps"),
                 (101, "pack my box with five dozen jugs")]
    cand_rows = [
        (1, "a lazy dog saw the quick brown fox leap"),   # shares a 3-gram
        (2, "entirely novel words only here"),            # clean
        (3, "pack my box with care today"),               # shares one
        (4, "tiny"),                                      # no 3-grams at all
    ]
    docs = spark.createDataFrame(cand_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in web.contamination(docs, ev, n=3).collect()}
    eval_g = set().union(*(grams(t) for _, t in eval_rows))
    for i, t in cand_rows:
        g = grams(t)
        assert out[i]["n_grams"] == len(g)
        assert out[i]["n_hit"] == len(g & eval_g)
        assert out[i]["contaminated"] == (len(g & eval_g) > 0)
    assert out[1]["contaminated"] and out[3]["contaminated"]
    assert not out[2]["contaminated"] and not out[4]["contaminated"]
