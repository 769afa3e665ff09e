"""Incrementally-maintained host link graph (streaming/linkidx.py): the
stored edge index equals a full host_edges recompute over the live
corpus after every refresh — across inserts, updates (links added AND
removed), and deletes — refreshes are exactly-once, and downstream
graph ops (degree_stats, pagerank) read live_edges(idx) identically to
the full-recompute frame."""

from __future__ import annotations

import datetime
import re

from pyspark.sql import Row

from tapdata_connectors_spark.operators import linkgraph
from tapdata_connectors_spark.schema import EVENTS_SCHEMA
from tapdata_connectors_spark.sources.generator import stage_events
from tapdata_connectors_spark.streaming import CdcPipeline
from tapdata_connectors_spark.streaming.linkidx import (
    create_link_index,
    linkidx_watermark,
    live_edges,
    refresh_link_index,
)


def _html(body: str, links: list[str]) -> bytes:
    anchors = "".join(f'<a href="{l}">x</a>' for l in links)
    return f"<html><body><p>{body}</p>{anchors}</body></html>".encode()


def _bootstrap(spark, base, pages):
    rows = [Row(url=u, warc_ts=datetime.datetime(2026, 1, 1, 0, 0, i),
                html=_html(body, links), lang="en")
            for i, (u, body, links) in enumerate(pages)]
    pipe = CdcPipeline(spark, f"{base}/pages", f"{base}/staging",
                       n_buckets=4, merge_mode="mor")
    pipe.bootstrap_snapshot(spark.createDataFrame(rows))
    return pipe


def _cdc_events(spark, rows):
    out = []
    for seq, epoch, op, url, body, links in rows:
        ts = datetime.datetime(2026, 6, 2, 0, 0, seq % 60)
        after = ((url, ts, _html(body, links), "en")
                 if op != "D" else None)
        out.append((seq, epoch, op, url, ts, None, after,
                    None, None, None, f"x{seq}", None))
    return spark.createDataFrame(out, EVENTS_SCHEMA)


def _py_edges(pipe) -> dict:
    """(src_host, dst_host) -> count oracle over the live corpus html."""
    want: dict = {}
    for r in pipe.table.read().select("url", "html").collect():
        if r["html"] is None:
            continue
        src = re.sub(r"^https://(www\.)?", "", r["url"]).split("/")[0]
        for tgt in re.findall(r'href="([^"]+)"', r["html"].decode()):
            m = re.match(r"^https://([^/:]+)/", tgt)
            if m and m.group(1) != src:
                k = (src, m.group(1))
                want[k] = want.get(k, 0) + 1
    return want


def _stored(idx) -> dict:
    return {(r["src_host"], r["dst_host"]): r["n_links"]
            for r in live_edges(idx).collect()}


X1 = "https://x.example/1"
Y2 = "https://y.example/2"
Z3 = "https://z.example/3"


def test_link_index_tracks_full_recompute(spark, tmpdir_):
    pipe = _bootstrap(spark, tmpdir_, [
        ("https://ha.example/a", "alpha body", [X1, X1, Y2]),
        ("https://hb.example/b", "beta body", [Y2]),
    ])
    idx = create_link_index(spark, f"{tmpdir_}/linkidx", n_buckets=4)

    rep = refresh_link_index(pipe, idx)            # initial build
    assert not rep["skipped"] and rep["adjusted_edges"] == 3
    assert linkidx_watermark(idx) == pipe.table.current_version()
    assert _stored(idx) == _py_edges(pipe)
    assert _stored(idx)[("ha.example", "x.example")] == 2  # multiplicity

    # idempotent: nothing moved -> skipped
    assert refresh_link_index(pipe, idx)["skipped"] is True

    # epoch 0: new page linking x+z; update drops one of ha's x-links;
    # delete hb entirely (its y-edge must tombstone out)
    stage_events(_cdc_events(spark, [
        (10, 0, "I", "https://hc.example/c", "gamma", [X1, Z3]),
        (11, 0, "U", "https://ha.example/a", "alpha v2", [X1, Y2]),
        (12, 0, "D", "https://hb.example/b", None, None),
    ]), f"{tmpdir_}/staging")
    pipe.replay_batch()
    rep = refresh_link_index(pipe, idx)
    assert not rep["skipped"]
    got, want = _stored(idx), _py_edges(pipe)
    assert got == want
    assert got[("ha.example", "x.example")] == 1          # decremented
    assert ("hb.example", "y.example") not in got         # zeroed -> gone

    # second refresh with no new corpus version: skipped (watermark guard)
    assert refresh_link_index(pipe, idx)["skipped"] is True


def test_live_edges_feed_graph_ops_identically(spark, tmpdir_):
    pipe = _bootstrap(spark, tmpdir_, [
        ("https://ha.example/a", "alpha", [X1, Y2]),
        ("https://hb.example/b", "beta", [X1]),
        ("https://hx.example/x", "xbody", [Y2, Z3, Z3]),
    ])
    idx = create_link_index(spark, f"{tmpdir_}/linkidx", n_buckets=4)
    refresh_link_index(pipe, idx)

    full = linkgraph.host_edges(
        linkgraph.extract_outlinks(pipe.table.read())
    )
    a = {r["host"]: r["rank"]
         for r in linkgraph.pagerank(live_edges(idx), iters=6).collect()}
    b = {r["host"]: r["rank"]
         for r in linkgraph.pagerank(full, iters=6).collect()}
    assert set(a) == set(b)
    for h in a:
        assert abs(a[h] - b[h]) < 1e-12
    da = {r["host"]: (r["out_degree"], r["in_degree"], r["out_links"],
                      r["in_links"])
          for r in linkgraph.degree_stats(live_edges(idx)).collect()}
    db = {r["host"]: (r["out_degree"], r["in_degree"], r["out_links"],
                      r["in_links"])
          for r in linkgraph.degree_stats(full).collect()}
    assert da == db
