"""Physical-plan regression tests.

The two-phase fold/resolve (commit b3b4a92) exists to keep multi-KB payload
rows out of aggregation sort buffers: winners hash-aggregate (HashAggregate,
primitive buffers only) and payloads fetch through shuffled-hash joins.
These tests pin that physical shape so a refactor can't silently regress to
SortAggregate / SortMergeJoin over events (Spark 4.1 plans varlen max_by as
SortAggregate — measured, see operators/mor.py docstring).

Also: the COW merge's broadcast-vs-shuffle decision is bytes-based
(BROADCAST_KEY_BYTES); both plans must produce identical state.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tapdata_connectors_spark.operators.dedup import ColumnSpec, lww_fold
from tapdata_connectors_spark.operators.mor import KIND, ORD, resolve_mor
from tapdata_connectors_spark.schema import EVENTS_SCHEMA

PAYLOAD = [
    ColumnSpec("warc_ts", "timestamp", "image"),
    ColumnSpec("html", "binary", "image"),
    ColumnSpec("lang", "string", "image"),
]

TS0 = dt.datetime(2024, 1, 1)


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, n=200):
    rows = []
    for seq in range(n):
        op = "I" if seq % 7 == 0 else ("D" if seq % 13 == 0 else "U")
        url = f"u{seq % 37}"
        ts = TS0 + dt.timedelta(seconds=seq)
        after = (url, ts, f"<p>{seq}</p>".encode(), "en") if op != "D" else None
        rows.append((seq, 0, op, url, ts, None, after, None, None, None, f"e{seq}", seq))
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_lww_fold_plan_is_hash_aggregated(spark):
    plan = _phys(lww_fold(_events(spark), PAYLOAD))
    assert "HashAggregate" in plan
    assert "SortMergeJoin" not in plan, "payload fetch must stay sort-free"
    # phase-B payload fetch is a shuffled-hash join (hinted)
    assert "ShuffledHashJoin" in plan
    # The ONLY SortAggregate allowed is the dup-cleanup tail: a
    # dropDuplicates(first(...)) over the `__ndup > 0` subset (keys that
    # actually saw duplicate deliveries — a filtered sliver, never the full
    # event stream). Payload winners (max_by/max over events) must never
    # sort-aggregate.
    for line in plan.splitlines():
        if "SortAggregate" in line:
            assert "first(" in line and "max_by" not in line, line[:300]


def test_resolve_mor_plan_is_hash_aggregated(spark):
    rows = []
    for i in range(100):
        url = f"u{i % 23}"
        rows.append((url, TS0, f"<p>{i}</p>".encode(), "en", True, True, True,
                     "I" if i % 3 else "B", (TS0 + dt.timedelta(seconds=i), i)))
    schema = (
        "url string, warc_ts timestamp, html binary, lang string, "
        "`__set_warc_ts` boolean, `__set_html` boolean, `__set_lang` boolean, "
        f"{KIND} string, {ORD} struct<ts:timestamp, seq:bigint>"
    )
    unified = spark.createDataFrame(
        [(u, ts, h, lg, s1, s2, s3, k, o) for u, ts, h, lg, s1, s2, s3, k, o in rows],
        schema,
    )
    plan = _phys(resolve_mor(unified, PAYLOAD))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "SortMergeJoin" not in plan


def test_registry_queries_have_no_global_windows(spark):
    """No registry query may plan a single-partition (unpartitioned) Window
    — the all-rows-to-one-task shape that dies at scale. Sole exception:
    rownum_pagination, which intentionally reproduces the reference's
    global ROWNO_ pagination semantics and is a point query (documented in
    BENCH/BASELINE.md). VERDICT r2 item 4."""
    import os

    from tapdata_connectors_spark.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

    def unpartitioned_windows(df) -> list[str]:
        bad: list[str] = []

        def walk(node):
            if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
                bad.append(node.simpleString(120))
            kids = node.children()
            for i in range(kids.length()):
                walk(kids.apply(i))

        walk(df._jdf.queryExecution().optimizedPlan())
        return bad

    for name, fn in QUERIES.items():
        if name == "rownum_pagination":
            continue
        bad = unpartitioned_windows(fn(spark, sf_dir))
        assert not bad, f"{name} plans a global window: {bad}"


def test_merge_broadcast_and_shuffle_plans_agree(spark, tmpdir_, monkeypatch):
    """BROADCAST_KEY_BYTES=0 forces the shuffle plan; final state must equal
    the broadcast plan's (VERDICT r1 item 7)."""
    from tapdata_connectors_spark.lake import merge as merge_mod
    from tapdata_connectors_spark.sources.generator import (
        GeneratorConfig,
        generate_events,
        stage_events,
    )
    from tapdata_connectors_spark.streaming.driver import CdcPipeline
    from tests.helpers import assert_state_equal, oracle_replay

    cfg = GeneratorConfig(n_events=600, n_urls=80, epoch_size=300,
                          p_update=0.4, p_delete=0.1)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")

    p1 = CdcPipeline(spark, f"{tmpdir_}/t_bcast", f"{tmpdir_}/staging", n_buckets=4)
    p1.replay_batch()

    monkeypatch.setattr(merge_mod, "BROADCAST_KEY_BYTES", 0)
    p2 = CdcPipeline(spark, f"{tmpdir_}/t_shuffle", f"{tmpdir_}/staging", n_buckets=4)
    p2.replay_batch()

    oracle = oracle_replay(ev.collect())
    assert_state_equal(p1.table.read(), oracle)
    assert_state_equal(p2.table.read(), oracle)


def test_pk_range_chunks_approx_contract(spark):
    """The sketch-backed (exact=False) splitter must emit the same chunk
    CONTRACT as the exact mode: n half-open ranges covering every row,
    disjoint bounds, counts summing to the table, and roughly balanced
    depth (Greenwald-Khanna rank error ≤ n/accuracy)."""
    import os

    from tapdata_connectors_spark.queries import pk_range_chunks

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    rows = sorted(
        pk_range_chunks(orders, "o_orderkey", n_chunks=8, exact=False,
                        accuracy=1000).collect(),
        key=lambda r: r["chunk"],
    )
    assert [r["chunk"] for r in rows] == list(range(1, 9))
    assert sum(r["n_rows"] for r in rows) == total
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]  # disjoint, ordered ranges
    # balance: every chunk within 2x of ideal depth at accuracy=1000
    ideal = total / 8
    for r in rows:
        assert r["n_rows"] < 2 * ideal


def test_host_cap_plan_has_partial_window_group_limit(spark):
    """The skew story for rank-filter top-k rests on Catalyst's
    WindowGroupLimit running a PARTIAL per-key top-k map-side BEFORE the
    exchange (measured in BENCH/skew_bench.json; operators/skew.py
    documents the boundary). Pin it: if a refactor of host_cap_sample
    ever breaks the pushdown pattern (e.g. by materializing rk before
    the filter), a megahost's whole partition starts crossing the
    shuffle again and this fails."""
    from tapdata_connectors_spark.operators.web import host_cap_sample

    df = spark.createDataFrame(
        [(i, f"h{i % 5}") for i in range(100)], "doc_id long, source string"
    )
    plan = _phys(host_cap_sample(df, cap=3))
    # the tree prints top-down: Window <- WindowGroupLimit(Final) <- Sort
    # <- Exchange <- WindowGroupLimit(Partial) <- Sort. The map-side
    # PARTIAL below the exchange is the one that kills the skew, so it
    # must appear AFTER "Exchange" in the string (and the final above).
    pre, post = plan.split("Exchange", 1)
    assert "WindowGroupLimit" in pre, plan
    assert "WindowGroupLimit" in post, plan
