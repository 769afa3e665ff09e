"""Merge-on-read mode: delta append + read-time resolution + compaction
must converge to the exact same state as the COW merge and the sequential
oracle (the Hudi-MOR-shaped scale path, lake/delta.py + operators/resolve)."""

from __future__ import annotations

from tapdata_connectors_spark.sources.generator import (
    DdlSpec,
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay


def run_mor(spark, tmpdir_, cfg, compact_every=8):
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", compact_every=compact_every)
    pipe.replay_batch()
    oracle = oracle_replay(ev.collect())
    assert_state_equal(pipe.table.read(), oracle)
    return pipe, ev


def test_mor_basic_mix(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1200, n_urls=150, epoch_size=300,
                          p_update=0.45, p_delete=0.2, p_dup=0.05)
    pipe, _ = run_mor(spark, tmpdir_, cfg, compact_every=99)  # no compaction
    assert pipe.table.delta_file_counts()  # deltas actually pending


def test_mor_with_compaction_mid_stream(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1600, n_urls=150, epoch_size=200,
                          p_update=0.4, p_delete=0.15, p_removed_lang=0.2)
    pipe, ev = run_mor(spark, tmpdir_, cfg, compact_every=3)
    # compaction ran at least once and the final read still matches
    assert pipe.table.current_version() > 8


def test_mor_explicit_compact_idempotent_state(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=100, epoch_size=400, p_hot=0.6)
    pipe, ev = run_mor(spark, tmpdir_, cfg, compact_every=99)
    before = {(r["url"], r["text"]) for r in pipe.table.read().collect()}
    res = pipe.table.compact()
    assert res["buckets"]
    assert not pipe.table.delta_file_counts()
    after = {(r["url"], r["text"]) for r in pipe.table.read().collect()}
    assert before == after
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))


def test_mor_ddl_and_extras(spark, tmpdir_):
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300,
        ddl=(DdlSpec(seq=450, kind="ADD_COLUMN", column="views", new_type="int"),),
        extras_cols=(("views", 450, "int"),),
    )
    pipe, _ = run_mor(spark, tmpdir_, cfg, compact_every=2)
    df = pipe.table.read()
    assert "views" in df.columns
    assert df.filter("views is not null").count() > 0


def test_mor_resume_idempotent(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1000, n_urls=100, epoch_size=250)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    p1 = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                     n_buckets=4, merge_mode="mor")
    p1.replay_batch()
    v = p1.table.current_version()
    p2 = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                     n_buckets=4, merge_mode="mor")
    res = p2.replay_batch()
    assert all(r.get("skipped") for r in res)
    assert p2.table.current_version() == v
    assert_state_equal(p2.table.read(), oracle_replay(ev.collect()))


def test_mor_parallel_epoch_replay(spark, tmpdir_):
    """Concurrent epoch application (driver threads) must converge to the
    same state as sequential replay — delta resolution is order-based."""
    cfg = GeneratorConfig(n_events=2000, n_urls=200, epoch_size=250,
                          p_update=0.4, p_delete=0.15, p_dup=0.05, p_hot=0.4)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", compact_every=3)
    pipe.replay_batch(max_concurrent_epochs=4)
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
    # and it interoperates with compaction afterwards
    pipe.table.compact()
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))


def test_mor_chunked_epoch_replay(spark, tmpdir_):
    """Chunked epoch application (one Spark job per DDL-free run of
    epochs) must converge to the same state as sequential replay — the
    fold is associative across epoch boundaries."""
    cfg = GeneratorConfig(n_events=2000, n_urls=200, epoch_size=250,
                          p_update=0.4, p_delete=0.15, p_dup=0.05, p_hot=0.4)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", compact_every=3)
    res = pipe.replay_batch(epoch_batch=3)  # 8 epochs -> 3 chunks
    assert len([r for r in res if not r.get("skipped")]) == 3
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
    pipe.table.compact()
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))


def test_mor_chunked_resume_mixes_with_per_epoch(spark, tmpdir_):
    """A chunk records every member epoch's guard key atomically, so a
    chunked replay resumes cleanly over a partial per-epoch replay and
    vice versa (no double-apply, no gap)."""
    cfg = GeneratorConfig(n_events=1200, n_urls=120, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    p1 = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                     n_buckets=4, merge_mode="mor")
    # apply only epoch 0 the per-epoch way
    import os
    from pyspark.sql import functions as F
    from tapdata_connectors_spark.schema import EVENTS_SCHEMA
    df0 = spark.read.schema(EVENTS_SCHEMA).parquet(
        os.path.join(f"{tmpdir_}/staging", "epoch=0"))
    p1.apply_epoch(df0, 0, has_ddl=False)
    # chunked replay picks up the remaining epochs only
    res = p1.replay_batch(epoch_batch=10)
    applied = [r for r in res if not r.get("skipped")]
    assert len(applied) == 1  # one chunk for epochs 1..3
    assert_state_equal(p1.table.read(), oracle_replay(ev.collect()))
    # a second chunked replay is a full no-op
    res2 = p1.replay_batch(epoch_batch=10)
    assert all(r.get("skipped") for r in res2)


def test_mor_chunked_ddl_barrier(spark, tmpdir_):
    """DDL-bearing epochs stay barriers under chunked replay: schema
    evolution applies in source order between chunks."""
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300,
        ddl=(DdlSpec(seq=450, kind="ADD_COLUMN", column="views", new_type="int"),),
        extras_cols=(("views", 450, "int"),),
    )
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor")
    pipe.replay_batch(epoch_batch=10)
    df = pipe.table.read()
    assert "views" in df.columns
    assert df.filter("views is not null").count() > 0
    assert_state_equal(df, oracle_replay(ev.collect()))


def test_mor_chunked_broadcast_fold_replay(spark, tmpdir_):
    """epoch_batch + fold_broadcast (the bench configuration) must equal
    the sequential oracle end-to-end."""
    cfg = GeneratorConfig(n_events=2000, n_urls=200, epoch_size=250,
                          p_update=0.4, p_delete=0.15, p_dup=0.05, p_hot=0.4)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", compact_every=3,
                       fold_broadcast=True)
    pipe.replay_batch(epoch_batch=4)
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
    pipe.table.compact()
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
