"""Snapshot lifecycle: commit history, rollback/restore, and changelog
(change-data-feed) reads between versions.

Reference analog: the reference exposes per-run WriteListResult counters
and resumable offsets (SURVEY.md §2.8/§2.11); a shared lake needs the
equivalents attached to the TABLE — Iceberg snapshots/rollback and the
changelog view that lets downstream consumers chain incremental work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake import LakeTable
from tapdata_connectors_spark.sources.generator import (
    DdlSpec,
    GeneratorConfig,
    generate_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import _norm, assert_state_equal, oracle_replay


def _pipe(spark, tmpdir_, **kw):
    return CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, **kw)


def _apply(pipe, ev, epochs):
    for e in epochs:
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)


def _oracle_state(event_rows, upto_epoch=None):
    rows = [r for r in event_rows
            if upto_epoch is None or r["epoch"] <= upto_epoch]
    return {r["url"]: {k: _norm(v) for k, v in r.items()}
            for r in oracle_replay(rows).final_rows()}


def _expected_changes(event_rows, cut_epoch):
    """Python-side diff of the two oracle states → {url: change_type}."""
    old = _oracle_state(event_rows, cut_epoch)
    new = _oracle_state(event_rows)
    out = {}
    for u in new:
        if u not in old:
            out[u] = "insert"
        elif any(old[u].get(c) != new[u].get(c)
                 for c in set(old[u]) | set(new[u])):
            out[u] = "update"
    for u in old:
        if u not in new:
            out[u] = "delete"
    return out


def _got_changes(t, since, **kw):
    return {r["url"]: r["_change_type"]
            for r in t.read_changes(since, **kw).collect()}


# ---------------- history + rollback ----------------

def test_history_lists_commits_in_order(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=400, n_urls=60, epoch_size=200, p_delete=0.15))
    _apply(pipe, ev, [0, 1])
    h = pipe.table.history()
    versions = [e["version"] for e in h]
    assert versions == sorted(versions)
    assert versions[-1] == pipe.table.current_version()
    assert all(e["ts_ms"] is not None for e in h[1:])
    assert h[-1]["n_epochs_applied"] >= 2


def test_rollback_restores_state_and_epoch_guards(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=600, n_urls=80, epoch_size=300, p_delete=0.2, p_dup=0.05))
    rows = ev.collect()
    _apply(pipe, ev, [0])
    v_mid = pipe.table.current_version()
    _apply(pipe, ev, [1])
    assert pipe.table.current_version() > v_mid

    rv = pipe.table.rollback_to(v_mid)
    assert rv == pipe.table.current_version()
    # state is exactly the mid-replay oracle state again
    assert_state_equal(pipe.table.read(),
                       oracle_replay([r for r in rows if r["epoch"] <= 0]))
    # the abandoned head stays time-travel readable (roll-forward restore)
    assert pipe.table.read(version=rv - 1).count() == len(_oracle_state(rows))
    # epoch guards restored with the snapshot: epoch 1 re-applies cleanly
    _apply(pipe, ev, [1])
    assert_state_equal(pipe.table.read(), oracle_replay(rows))
    assert any(e["op"] == "rollback" for e in pipe.table.history())


def test_rollback_to_head_is_noop_and_vacuumed_target_raises(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=300, n_urls=40, epoch_size=100))
    _apply(pipe, ev, [0, 1, 2])
    head = pipe.table.current_version()
    assert pipe.table.rollback_to(head) == head

    pipe.table.vacuum(retain_last=1, min_age_sec=0.0)
    with pytest.raises(Exception):
        pipe.table.rollback_to(1)


# ---------------- changelog reads ----------------

def test_read_changes_classifies_against_oracle_diff(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=1000, n_urls=120, epoch_size=500,
        p_update=0.45, p_delete=0.2, p_dup=0.05))
    rows = ev.collect()
    _apply(pipe, ev, [0])
    v_cut = pipe.table.current_version()
    _apply(pipe, ev, [1])

    want = _expected_changes(rows, cut_epoch=0)
    got = _got_changes(pipe.table, v_cut)
    assert got == want
    assert set(want.values()) == {"insert", "update", "delete"}  # non-vacuous

    # delete rows carry the preimage values
    old = _oracle_state(rows, 0)
    for r in pipe.table.read_changes(v_cut).collect():
        if r["_change_type"] == "delete":
            assert _norm(r["text"]) == old[r["url"]]["text"]


def test_read_changes_preimage_shape(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=800, n_urls=100, epoch_size=400, p_update=0.5, p_delete=0.15))
    rows = ev.collect()
    _apply(pipe, ev, [0])
    v_cut = pipe.table.current_version()
    _apply(pipe, ev, [1])

    plain = pipe.table.read_changes(v_cut).collect()
    cdf = pipe.table.read_changes(v_cut, preimages=True).collect()
    n_upd = sum(1 for r in plain if r["_change_type"] == "update")
    by_type = {}
    for r in cdf:
        by_type.setdefault(r["_change_type"], 0)
        by_type[r["_change_type"]] += 1
    assert by_type.get("update_preimage", 0) == n_upd
    assert by_type.get("update_postimage", 0) == n_upd
    assert by_type.get("insert", 0) == sum(
        1 for r in plain if r["_change_type"] == "insert")
    assert by_type.get("delete", 0) == sum(
        1 for r in plain if r["_change_type"] == "delete")
    old = _oracle_state(rows, 0)
    new = _oracle_state(rows)
    for r in cdf:
        side = old if r["_change_type"] in ("update_preimage", "delete") else new
        assert _norm(r["text"]) == side[r["url"]]["text"], r["_change_type"]


def test_read_changes_prunes_untouched_buckets(spark, tmpdir_):
    fields = [("url", "string"), ("warc_ts", "timestamp"),
              ("html", "binary"), ("text", "string"), ("lang", "string")]
    t = LakeTable.create(spark, f"{tmpdir_}/t", fields, key="url", n_buckets=8)
    src = spark.createDataFrame(
        [(f"u{i}", None, None, f"t{i}", "en") for i in range(64)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_event_seq", F.lit(0).cast("long")) \
     .withColumn("_deleted", F.lit(False)) \
     .withColumn("_mb", t.bucket_expr("url"))
    t.commit_files(t.write_data_files(src, "_mb"))
    v1 = t.current_version()

    # COW rewrite of u7's whole bucket: bucket-mates rewritten unchanged
    b7 = src.filter(F.col("url") == "u7").select("_mb").collect()[0][0]
    upd = src.filter(F.col("_mb") == b7).withColumn(
        "text",
        F.when(F.col("url") == "u7", F.lit("CHANGED")).otherwise(F.col("text")),
    )
    t.commit_files(t.write_data_files(upd, "_mb"), replaced_buckets={b7})

    # manifest diff narrows the read to the single rewritten bucket...
    assert t.changed_buckets(v1) == [b7]
    # ...and the value diff refines the COW bucket-mates away
    got = {r["url"]: (r["_change_type"], r["text"])
           for r in t.read_changes(v1).collect()}
    assert got == {"u7": ("update", "CHANGED")}


def test_read_changes_empty_when_nothing_changed(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=200, n_urls=30, epoch_size=200))
    _apply(pipe, ev, [0])
    v = pipe.table.current_version()
    df = pipe.table.read_changes(v, v)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_read_changes_across_ddl_aligns_by_field_id(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_)
    ev = generate_events(spark, GeneratorConfig(
        n_events=600, n_urls=80, epoch_size=300,
        ddl=(DdlSpec(seq=450, kind="ADD_COLUMN", column="views",
                     new_type="int"),),
        extras_cols=(("views", 450, "int"),),
    ))
    rows = ev.collect()
    _apply(pipe, ev, [0])
    v_cut = pipe.table.current_version()
    _apply(pipe, ev, [1])  # contains the ADD COLUMN barrier

    # rename AFTER the data epochs: old snapshot must still align by id
    pipe.table.rename_column("lang", "language")

    df = pipe.table.read_changes(v_cut)
    assert "views" in df.columns and "language" in df.columns
    got = {r["url"]: r["_change_type"] for r in df.collect()}
    want = _expected_changes(rows, cut_epoch=0)
    assert got == want


def test_read_changes_mor_deltas(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=900, n_urls=110, epoch_size=300,
        p_update=0.4, p_delete=0.2))
    rows = ev.collect()
    _apply(pipe, ev, [0])
    v_cut = pipe.table.current_version()
    _apply(pipe, ev, [1, 2])
    assert pipe.table.delta_file_counts()  # deltas genuinely pending

    want = _expected_changes(rows, cut_epoch=0)
    got = _got_changes(pipe.table, v_cut)
    assert got == want


def test_read_changes_compaction_reports_nothing(spark, tmpdir_):
    pipe = _pipe(spark, tmpdir_, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=400, n_urls=60, epoch_size=200))
    _apply(pipe, ev, [0, 1])
    v = pipe.table.current_version()
    pipe.table.compact()
    assert pipe.table.current_version() > v
    # files changed, logical state did not
    assert pipe.table.changed_buckets(v)
    assert pipe.table.read_changes(v).count() == 0
