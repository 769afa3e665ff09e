"""Multi-table routing (streaming/multi.py) + clear/drop table DDL."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tapdata_connectors_spark.sources.generator import (
    GeneratorConfig,
    generate_events,
    stage_events,
    stage_events_multi,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tapdata_connectors_spark.streaming.multi import MultiTableReplicator
from tests.helpers import assert_state_equal, oracle_replay


def test_multi_table_replication(spark, tmpdir_):
    # two tables with different logs in one stream; routing = partition
    # fan-out; each table's final state equals its own oracle replay
    cfg_a = GeneratorConfig(n_events=500, n_urls=60, epoch_size=250, seed=1,
                            p_update=0.4, p_delete=0.1)
    cfg_b = GeneratorConfig(n_events=400, n_urls=40, epoch_size=200, seed=2,
                            p_update=0.2, p_delete=0.2)
    ev_a = generate_events(spark, cfg_a)
    ev_b = generate_events(spark, cfg_b)
    both = ev_a.withColumn("table_id", F.lit("pages_a")).unionByName(
        ev_b.withColumn("table_id", F.lit("pages_b"))
    )
    stage_events_multi(both, f"{tmpdir_}/staging")

    rep = MultiTableReplicator(
        spark, f"{tmpdir_}/tables", f"{tmpdir_}/staging", n_buckets=4
    )
    assert rep.table_ids() == ["pages_a", "pages_b"]
    res = rep.replay_batch(max_concurrent_tables=2)
    assert set(res) == {"pages_a", "pages_b"}

    assert_state_equal(rep.pipeline("pages_a").table.read(), oracle_replay(ev_a.collect()))
    assert_state_equal(rep.pipeline("pages_b").table.read(), oracle_replay(ev_b.collect()))


def test_clear_table(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=300, n_urls=50, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    pipe.replay_batch()
    t = pipe.table
    assert t.read().count() > 0
    v_before = t.current_version()

    t.clear()
    assert t.read().count() == 0
    # schema + history retained; time travel still sees the old data
    assert [f.name for f in t.schema().fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert t.read(version=v_before).count() > 0
    # applied_epochs survive: a re-replay after clear stays a no-op
    res = pipe.replay_batch()
    assert all(r.get("skipped") for r in res)
    assert t.read().count() == 0


def test_drop_table(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=200, n_urls=30, epoch_size=200)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    pipe.replay_batch()
    t = pipe.table
    assert t.exists()
    t.drop()
    assert not t.exists()
    assert not os.path.exists(t.path)
