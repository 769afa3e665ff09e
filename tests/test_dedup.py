"""Unit tests for the last-writer-wins fold (operators/dedup.py).

Hand-built event sets exercising the reference's apply semantics:
partial updates (DbKit.java:177-202), removed_fields nulling
(MongodbV4StreamReader.java:317-335), delete-reset, duplicate delivery
(MysqlReader.java:851-854), out-of-order neutrality."""

from __future__ import annotations

import datetime as dt

from tapdata_connectors_spark.operators.dedup import ColumnSpec, lww_fold
from tapdata_connectors_spark.schema import EVENTS_SCHEMA

TS0 = dt.datetime(2024, 1, 1)

PAYLOAD = [
    ColumnSpec("warc_ts", "timestamp", "image"),
    ColumnSpec("html", "binary", "image"),
    ColumnSpec("lang", "string", "image"),
]


def ev(seq, op, url, html=None, lang=None, removed=None, extras=None, epoch=0):
    ts = TS0 + dt.timedelta(seconds=seq)
    after = None
    if op in ("I", "U"):
        after = (url, ts, html, lang)
    return (seq, epoch, op, url, ts, None, after, removed, extras, None, f"eo_{seq}", seq)


def fold(spark, rows, payload=PAYLOAD):
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    return {r["url"]: r.asDict() for r in lww_fold(df, payload).collect()}


def test_insert_then_partial_update(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"<p>a</p>", lang="en"),
        ev(2, "U", "u1", html=b"<p>b</p>"),  # lang absent -> unchanged
    ])
    r = out["u1"]
    assert r["_final_op"] == "I"  # insert then update => row being created
    assert bytes(r["html"]) == b"<p>b</p>"
    assert r["lang"] == "en" and r["__set_lang"]
    assert r["_final_seq"] == 2


def test_update_only_partial_set_flags(spark):
    out = fold(spark, [ev(5, "U", "u1", html=b"x")])
    r = out["u1"]
    assert r["_final_op"] == "U"
    assert r["__set_html"] and not r["__set_lang"]


def test_removed_fields_explicit_null(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"a", lang="en"),
        ev(2, "U", "u1", removed=["lang"]),
    ])
    r = out["u1"]
    assert r["lang"] is None and r["__set_lang"]  # explicitly nulled, not "unchanged"
    assert bytes(r["html"]) == b"a"


def test_delete_resets_prior_values(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"old", lang="en"),
        ev(2, "D", "u1"),
        ev(3, "U", "u1", html=b"new"),  # update after delete: partial, on absent row
    ])
    r = out["u1"]
    # delete-then-update-only is its own state: the delete must apply, the
    # trailing updates are policy-resolved (default: dropped)
    assert r["_final_op"] == "DU"
    assert r["_del_seq"] == 2
    assert bytes(r["html"]) == b"new"
    assert r["lang"] is None and not r["__set_lang"]  # en must NOT leak past the delete


def test_delete_then_reinsert(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"old", lang="en"),
        ev(2, "D", "u1"),
        ev(3, "I", "u1", html=b"fresh"),
    ])
    r = out["u1"]
    assert r["_final_op"] == "I"
    assert bytes(r["html"]) == b"fresh"
    assert r["lang"] is None and r["__set_lang"]  # full image: lang reset to null


def test_final_delete(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"a", lang="en"),
        ev(2, "D", "u1"),
    ])
    assert out["u1"]["_final_op"] == "D"


def test_duplicate_delivery_is_noop(spark):
    base = [ev(1, "I", "u1", html=b"a", lang="en"), ev(2, "U", "u1", html=b"b")]
    dup = base + [ev(2, "U", "u1", html=b"b")]  # redelivered event
    a, b = fold(spark, base)["u1"], fold(spark, dup)["u1"]
    for k in ("_final_seq", "_final_op", "lang"):
        assert a[k] == b[k]
    assert bytes(a["html"]) == bytes(b["html"])
    assert b["_n_events"] == 3  # raw count still visible for lineage


def test_out_of_order_neutrality(spark):
    evs = [
        ev(1, "I", "u1", html=b"a", lang="en"),
        ev(2, "U", "u1", lang="de"),
        ev(3, "U", "u1", html=b"c"),
    ]
    shuffled = [evs[2], evs[0], evs[1]]
    a, b = fold(spark, evs)["u1"], fold(spark, shuffled)["u1"]
    assert bytes(a["html"]) == bytes(b["html"]) == b"c"
    assert a["lang"] == b["lang"] == "de"
    assert a["_final_seq"] == b["_final_seq"] == 3


def test_insert_overwrites_as_full_image(spark):
    # I ... I: the second insert resets columns the first had set
    out = fold(spark, [
        ev(1, "I", "u1", html=b"a", lang="en"),
        ev(2, "I", "u1", html=b"b"),  # lang null in full image
    ])
    r = out["u1"]
    assert bytes(r["html"]) == b"b"
    assert r["lang"] is None and r["__set_lang"]


def test_extras_columns(spark):
    payload = PAYLOAD + [ColumnSpec("views", "int", "extras")]
    out = fold(spark, [
        ev(1, "I", "u1", html=b"a", extras={"views": "10"}),
        ev(2, "U", "u1", extras={"views": "11"}),
        ev(3, "U", "u1", html=b"b"),  # views unmentioned -> unchanged
    ], payload)
    r = out["u1"]
    assert r["views"] == 11 and r["__set_views"]
    assert bytes(r["html"]) == b"b"


def test_multiple_keys_independent(spark):
    out = fold(spark, [
        ev(1, "I", "u1", html=b"a"),
        ev(2, "I", "u2", html=b"b"),
        ev(3, "D", "u2"),
    ])
    assert out["u1"]["_final_op"] == "I"
    assert out["u2"]["_final_op"] == "D"


def test_broadcast_fold_equals_shuffle_fold(spark):
    """broadcast_winners=True (map-side phase B) must produce byte-identical
    fold output to the default shuffled-hash phase B on a fixture covering
    inserts, partial updates, removed_fields, deletes, reinserts, dup
    deliveries and a final-delete key."""
    rows = [
        ev(1, "I", "a", html=b"<a1>", lang="en"),
        ev(2, "U", "a", lang="de"),
        ev(3, "I", "b", html=b"<b1>", lang="fr"),
        ev(4, "D", "b"),
        ev(5, "I", "b", html=b"<b2>"),
        ev(6, "I", "c", html=b"<c1>", lang="es"),
        ev(6, "I", "c", html=b"<c1>", lang="es"),  # duplicate delivery
        ev(7, "U", "c", removed=["lang"]),
        ev(8, "I", "d", html=b"<d1>", lang="en"),
        ev(9, "D", "d"),  # final delete
        ev(10, "U", "a", html=b"<a2>"),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    cols = sorted(lww_fold(df, PAYLOAD).columns)
    a = {r["url"]: tuple(r[c] for c in cols)
         for r in lww_fold(df, PAYLOAD).collect()}
    b = {r["url"]: tuple(r[c] for c in cols)
         for r in lww_fold(df, PAYLOAD, broadcast_winners=True).collect()}
    assert a == b
    # plan shape: phase B carries no shuffled join of payload values, and
    # every broadcast join builds the skinny (right) side — BuildLeft would
    # mean Spark is broadcasting the byte-carrying stream side, and a
    # SortMerge/ShuffledHash join would mean a hint was silently dropped
    # (the historical right_outer+broadcast(preserved) bug: RightOuter
    # supports BuildLeft only, so the hint was ignored)
    plan = lww_fold(df, PAYLOAD, broadcast_winners=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BuildLeft" not in plan  # binary/payload side must never be built
