"""Staging-order contract: validation (operators/ordering.py), the fail-loud
adapter gate, and the (ts, seq)-ordered fallback paths for sources whose
version timestamp disagrees with log position (VERDICT r1 "What's wrong" #2).
"""

from __future__ import annotations

import datetime as dt

import pytest

from tapdata_connectors_spark.operators.dedup import (
    ColumnSpec,
    lww_fold,
    lww_fold_singleagg,
)
from tapdata_connectors_spark.operators.ordering import (
    require_seq_ts_order,
    seq_ts_inversions,
)
from tapdata_connectors_spark.schema import EVENTS_SCHEMA
from tapdata_connectors_spark.sources.file_source import (
    ChangelogMapping,
    changelog_to_events,
)
from tests.helpers import assert_state_equal, oracle_replay

TS0 = dt.datetime(2024, 1, 1)

PAYLOAD = [
    ColumnSpec("warc_ts", "timestamp", "image"),
    ColumnSpec("html", "binary", "image"),
    ColumnSpec("lang", "string", "image"),
]


def _ev(seq, op, url, ts_off, html=None, lang=None, epoch=0):
    """Event whose warc_ts is decoupled from event_seq (ts_off seconds)."""
    ts = TS0 + dt.timedelta(seconds=ts_off)
    after = (url, ts, html, lang) if op in ("I", "U") else None
    return (seq, epoch, op, url, ts, None, after, None, None, None, f"eo_{seq}", seq)


def test_inversions_zero_on_monotone(spark):
    rows = [(i, TS0 + dt.timedelta(seconds=i)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_seq: long, warc_ts: timestamp")
    assert seq_ts_inversions(df) == 0


def test_inversions_detects_violations_and_boundaries(spark):
    # ts goes 0,1,...,99 except ts[50]=10: exactly one inversion (49 -> 50),
    # and it must survive any partitioning — including a partition boundary
    # landing exactly on the dip
    rows = [(i, TS0 + dt.timedelta(seconds=(10 if i == 50 else i))) for i in range(100)]
    df = spark.createDataFrame(rows, "event_seq: long, warc_ts: timestamp")
    for n in (1, 2, 4, 16):
        assert seq_ts_inversions(df, num_partitions=n) == 1, n


def test_inversions_exact_count(spark):
    rows = [(1, TS0 + dt.timedelta(seconds=5)),
            (2, TS0 + dt.timedelta(seconds=3)),   # inversion
            (3, TS0 + dt.timedelta(seconds=4)),
            (4, TS0 + dt.timedelta(seconds=1))]   # inversion
    df = spark.createDataFrame(rows, "event_seq: long, warc_ts: timestamp")
    for n in (1, 2, 4):
        assert seq_ts_inversions(df, num_partitions=n) == 2, n


def test_ties_are_not_inversions(spark):
    rows = [(i, TS0 + dt.timedelta(seconds=i // 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_seq: long, warc_ts: timestamp")
    assert seq_ts_inversions(df, num_partitions=4) == 0


def test_adapter_rejects_non_monotone_changelog(spark):
    rows = [(1, "u1", "insert", TS0 + dt.timedelta(seconds=9), "a"),
            (2, "u1", "update", TS0 + dt.timedelta(seconds=3), "b")]
    df = spark.createDataFrame(
        rows, "pos: long, k: string, o: string, t: timestamp, payload: string"
    )
    m = ChangelogMapping(key="k", seq="pos", op="o", ts="t")
    with pytest.raises(ValueError, match="staging order contract"):
        changelog_to_events(df, m)
    # explicit opt-out converts without the gate
    out = changelog_to_events(df, m, validate_order=False)
    assert out.count() == 2


def test_fallback_fold_orders_by_ts_then_seq(spark):
    # seq order says u2's html=b"late-pos" wins; (ts, seq) LWW order says
    # html=b"late-ts" wins because its version timestamp is newer.
    rows = [
        _ev(1, "I", "u1", ts_off=10, html=b"late-ts", lang="en"),
        _ev(2, "U", "u1", ts_off=5, html=b"late-pos"),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    two_phase = {r["url"]: r.asDict() for r in lww_fold(df, PAYLOAD).collect()}
    fallback = {
        r["url"]: r.asDict()
        for r in lww_fold(df, PAYLOAD, seq_is_lww_order=False).collect()
    }
    single = {
        r["url"]: r.asDict() for r in lww_fold_singleagg(df, PAYLOAD).collect()
    }
    # the contract matters: seq-ordered and (ts,seq)-ordered winners differ
    assert bytes(two_phase["u1"]["html"]) == b"late-pos"
    assert bytes(fallback["u1"]["html"]) == b"late-ts"
    assert bytes(single["u1"]["html"]) == b"late-ts"
    assert fallback["u1"]["_final_seq"] == single["u1"]["_final_seq"]


def _non_monotone_events(spark, n_keys=30, n_events=300, epochs=3):
    """Deterministic changelog whose warc_ts is decorrelated from seq."""
    rows = []
    for seq in range(1, n_events + 1):
        k = f"u{(seq * 7) % n_keys}"
        op = "I" if seq % 11 == 1 else ("D" if seq % 17 == 0 else "U")
        ts_off = (seq * 131) % 257  # pseudo-random but deterministic
        html = f"<p>v{seq}</p>".encode() if op != "D" else None
        lang = ["en", "de", "fr"][seq % 3] if seq % 5 else None
        epoch = (seq - 1) * epochs // n_events
        rows.append(_ev(seq, op, k, ts_off, html=html, lang=lang, epoch=epoch))
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_pipeline_non_monotone_matches_oracle(spark, tmpdir_):
    """End-to-end: a ts-decorrelated stream replayed with
    seq_is_lww_order=False (COW) converges to the sequential oracle's state
    — the sequential resolver replays raw events against the target row at
    its own stored order, so batches that STRADDLE it resolve exactly."""
    from tapdata_connectors_spark.sources.generator import stage_events
    from tapdata_connectors_spark.streaming.driver import CdcPipeline

    df = _non_monotone_events(spark)
    assert seq_ts_inversions(df) > 0  # the fixture really is non-monotone
    stage_events(df, f"{tmpdir_}/staging")
    pipe = CdcPipeline(
        spark,
        f"{tmpdir_}/pages",
        f"{tmpdir_}/staging",
        n_buckets=4,
        merge_mode="cow",
        seq_is_lww_order=False,
    )
    pipe.replay_batch()
    oracle = oracle_replay(df.collect())
    assert_state_equal(pipe.table.read(), oracle)


def test_mor_refuses_non_monotone(spark, tmpdir_):
    """MOR resolution is a global fold: with a non-monotone source the final
    state legitimately depends on epoch boundaries (an applied update blocks
    an older-ts delete arriving later) — only the incremental COW merge can
    reproduce that, so MOR must refuse loudly."""
    from tapdata_connectors_spark.streaming.driver import CdcPipeline

    with pytest.raises(ValueError, match="staging order contract"):
        CdcPipeline(
            spark,
            f"{tmpdir_}/pages",
            f"{tmpdir_}/staging",
            merge_mode="mor",
            seq_is_lww_order=False,
        )


def test_require_seq_ts_order_passthrough(spark):
    rows = [(i, TS0 + dt.timedelta(seconds=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_seq: long, warc_ts: timestamp")
    assert require_seq_ts_order(df) is df
