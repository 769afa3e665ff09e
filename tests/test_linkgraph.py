"""Link-graph operators (operators/linkgraph.py): outlink extraction
against handcrafted html, host-graph/degree accounting against a Python
re.findall oracle over a real replayed pages table, and PageRank against
a Python power-iteration oracle (same damping + uniform dangling
redistribution), plus spill-window invariance of the iterative loop."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tapdata_connectors_spark.operators import linkgraph
from tapdata_connectors_spark.sources import (
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming import CdcPipeline


def test_extract_outlinks_handcrafted(spark):
    rows = [
        # tracking params stripped, fragment dropped by canonicalization
        ("https://a.example/x",
         b'<p><a href="https://b.example/p?utm_source=t&id=1#frag">y</a></p>'),
        # relative + mailto: no scheme://host -> dropped
        ("https://a.example/y",
         b'<a href="/local/path">l</a><a href="mailto:x@y.z">m</a>'),
        # self-host link dropped by default
        ("https://a.example/z", b'<a href="https://a.example/other">s</a>'),
        # www. + default port fold into the canonical host
        ("https://c.example/w", b'<a href="https://www.d.example:443/q">d</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r["url"], r["outlink"], r["dst_host"])
        for r in linkgraph.extract_outlinks(df).collect()
    }
    assert got == {
        ("https://a.example/x", "https://b.example/p?id=1", "b.example"),
        ("https://c.example/w", "https://d.example/q", "d.example"),
    }
    kept_self = linkgraph.extract_outlinks(df, keep_self=True)
    assert kept_self.filter("dst_host = src_host").count() == 1


def _python_links(pages: list) -> list:
    """(src_host, dst_host) per href — the generator's anchors are
    already canonical, so the oracle is a plain findall."""
    out = []
    for url, html in pages:
        src_host = re.sub(r"^https://(www\.)?", "", url).split("/")[0]
        for tgt in re.findall(r'href="([^"]+)"', html.decode()):
            m = re.match(r"^https://([^/]+)/", tgt)
            if m and m.group(1) != src_host:
                out.append((src_host, m.group(1)))
    return out


def test_host_graph_matches_python_over_replayed_table(spark, tmpdir_):
    cfg = GeneratorConfig(
        n_events=1200, n_urls=150, epoch_size=400,
        p_update=0.3, p_delete=0.1, n_links=3, n_link_hosts=12,
    )
    stage_events(generate_events(spark, cfg), f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor")
    pipe.init_table()
    pipe.replay_batch(epoch_batch=8)
    final = pipe.table.read().filter(F.col("html").isNotNull())

    links = linkgraph.extract_outlinks(final)
    edges = linkgraph.host_edges(links)

    want: dict[tuple, int] = {}
    for s, d in _python_links(
        [(r["url"], r["html"]) for r in final.select("url", "html").collect()]
    ):
        want[(s, d)] = want.get((s, d), 0) + 1
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"] for r in edges.collect()
    }
    assert got == want
    assert all(d.startswith("site-") for _, d in got)

    deg = {r["host"]: r for r in linkgraph.degree_stats(edges).collect()}
    for (s, d), n in want.items():
        assert deg[s]["out_links"] >= n and deg[d]["in_links"] >= n
    total = sum(want.values())
    assert sum(r["out_links"] for r in deg.values()) == total
    assert sum(r["in_links"] for r in deg.values()) == total


def test_frontier_candidates(spark):
    rows = [
        ("https://ha.example/a",
         b'<a href="https://x.example/new1">1</a>'
         b'<a href="https://x.example/new2">2</a>'
         b'<a href="https://hb.example/b">known</a>'),
        ("https://hb.example/b",
         b'<a href="https://x.example/new1">dup</a>'
         b'<a href="https://y.example/fresh?utm_source=t">t</a>'),
    ]
    corpus = spark.createDataFrame(rows, "url string, html binary")
    links = linkgraph.extract_outlinks(corpus)
    fresh = {(r["url"], r["dst_host"])
             for r in linkgraph.frontier_candidates(links, corpus).collect()}
    # hb.example/b is already in the corpus; the utm param canonicalizes
    # away; new1 appears once despite two referrers
    assert fresh == {
        ("https://x.example/new1", "x.example"),
        ("https://x.example/new2", "x.example"),
        ("https://y.example/fresh", "y.example"),
    }
    capped = linkgraph.frontier_candidates(links, corpus, per_host_cap=1)
    per_host = {r["dst_host"]: r["rk"] for r in capped.collect()}
    assert per_host == {"x.example": 1, "y.example": 1}


def _py_pagerank(edges: list, iters: int, d: float = 0.85) -> dict:
    """Oracle: same formulation as linkgraph.pagerank (weighted, uniform
    dangling redistribution)."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    outw: dict = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in outw)
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += rank[s] * (w / outw[s])
        rank = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return rank


_GRAPH = [
    ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
    ("c", "a", 1.0), ("d", "c", 3.0),  # e below is dangling
    ("b", "e", 1.0),
]


def test_pagerank_matches_python_oracle(spark):
    edges = spark.createDataFrame(
        [(s, t, int(w)) for s, t, w in _GRAPH],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["host"]: r["rank"] for r in linkgraph.pagerank(edges, iters=12).collect()}
    want = _py_pagerank(_GRAPH, iters=12)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_spill_window_invariance(spark, tmpdir_):
    edges = spark.createDataFrame(
        [(s, t, int(w)) for s, t, w in _GRAPH],
        "src_host string, dst_host string, n_links long",
    )
    a = {r["host"]: r["rank"]
         for r in linkgraph.pagerank(edges, iters=7, steps_per_spill=1,
                                     spill_dir=f"{tmpdir_}/pr1").collect()}
    b = {r["host"]: r["rank"]
         for r in linkgraph.pagerank(edges, iters=7, steps_per_spill=5,
                                     spill_dir=f"{tmpdir_}/pr5").collect()}
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12
