"""Double-active (bidirectional sync) loop protection
(operators/events.tag_origin + drop_loopback_events): events a pipeline
wrote and a bidirectional peer reflects back must be filtered on the
return path; foreign and untagged events pass."""

from __future__ import annotations

import datetime as dt

from tapdata_connectors_spark.operators.events import (
    drop_loopback_events,
    tag_origin,
)
from tapdata_connectors_spark.schema import EVENTS_SCHEMA

TS0 = dt.datetime(2024, 1, 1)


def _ev(seq, url, extras=None):
    after = (url, TS0, b"<x>", "en")
    return (seq, 0, "I", url, TS0, None, after, None, extras, None, f"eo_{seq}", seq)


def test_loopback_filtered_foreign_and_untagged_pass(spark):
    rows = [
        _ev(1, "a", {"_origin": "pipe_A"}),   # our own reflected write
        _ev(2, "b", {"_origin": "pipe_B"}),   # foreign peer's write
        _ev(3, "c", None),                    # untagged unidirectional
        _ev(4, "d", {"other": "x"}),          # tagged with unrelated key
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    kept = sorted(r["url"] for r in drop_loopback_events(df, "pipe_A").collect())
    assert kept == ["b", "c", "d"]


def test_tag_then_drop_roundtrip(spark):
    rows = [_ev(1, "a", None), _ev(2, "b", {"k": "v"})]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    tagged = tag_origin(df, "pipe_A")
    got = {r["url"]: dict(r["extras"]) for r in tagged.collect()}
    assert got["a"]["_origin"] == "pipe_A"
    assert got["b"] == {"k": "v", "_origin": "pipe_A"}
    # the writing pipeline's own filter drops everything it tagged...
    assert drop_loopback_events(tagged, "pipe_A").count() == 0
    # ...while a different pipeline keeps it all
    assert drop_loopback_events(tagged, "pipe_B").count() == 2


def test_retag_already_tagged_event_replaces(spark):
    """Re-tagging a row that already carries an _origin tag (the natural
    relay case in a bidirectional topology) must REPLACE the tag, not
    throw — Spark's default mapKeyDedupPolicy=EXCEPTION makes a naive
    map_concat a runtime 'duplicate map key' error."""
    rows = [_ev(1, "a", {"_origin": "pipe_B", "k": "v"})]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {r["url"]: dict(r["extras"])
           for r in tag_origin(df, "pipe_A").collect()}
    assert got["a"] == {"k": "v", "_origin": "pipe_A"}
