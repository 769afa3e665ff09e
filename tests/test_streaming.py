"""Structured-Streaming replay: epoch-marker source, checkpoint resume,
late-arriving epochs (regression for the file-source ordering bug where a
later epoch's DML could overtake an earlier epoch's DDL)."""

from __future__ import annotations

from tapdata_connectors_spark.sources.generator import (
    DdlSpec,
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay


def test_stream_replay_with_ddl_and_resume(spark, tmpdir_):
    cfg = GeneratorConfig(
        n_events=1500, n_urls=200, epoch_size=300, p_hot=0.4, p_dup=0.05,
        ddl=(DdlSpec(seq=750, kind="ADD_COLUMN", column="views", new_type="int"),),
        extras_cols=(("views", 750, "int"),),
    )
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    q = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=2)
    q.awaitTermination(300)
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))

    # restart on the same checkpoint with no new data: no state change
    v = pipe.table.current_version()
    q2 = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=2)
    q2.awaitTermination(300)
    assert pipe.table.current_version() == v

    # late epochs arrive; the stream picks up exactly the new ones
    cfg2 = GeneratorConfig(n_events=600, n_urls=200, epoch_size=300,
                           start_seq=1500, p_hot=0.4)
    ev2 = generate_events(spark, cfg2)
    stage_events(ev2, f"{tmpdir_}/staging", mode="append")
    q3 = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=2)
    q3.awaitTermination(300)
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect() + ev2.collect()))


def test_lifecycle_listener_records_events(spark, tmpdir_):
    # StreamingQueryListener lifecycle callbacks (SURVEY.md §2.11)
    import time as _t

    cfg = GeneratorConfig(n_events=300, n_urls=50, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    q = pipe.run_stream(f"{tmpdir_}/ckpt")
    q.awaitTermination(300)
    # listener events arrive on a background bus thread; give it a moment
    for _ in range(50):
        kinds = {e["event"] for e in pipe.lifecycle_events}
        if {"started", "terminated"} <= kinds:
            break
        _t.sleep(0.2)
    kinds = {e["event"] for e in pipe.lifecycle_events}
    assert "started" in kinds and "terminated" in kinds


def test_stream_chunked_epoch_batch(spark, tmpdir_):
    """run_stream(epoch_batch=k): DDL-free epochs inside a trigger apply
    as chunks; final state equals the sequential oracle and a restart on
    the same checkpoint does not move the table version."""
    from tapdata_connectors_spark.sources.generator import (
        GeneratorConfig,
        generate_events,
        stage_events,
    )
    from tapdata_connectors_spark.streaming.driver import CdcPipeline
    from tests.helpers import assert_state_equal, oracle_replay

    cfg = GeneratorConfig(n_events=1500, n_urls=150, epoch_size=250,
                          p_update=0.4, p_delete=0.15, p_dup=0.05)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", fold_broadcast=True)
    q = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=3,
                        epoch_batch=4)
    q.awaitTermination(600)
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
    v = pipe.table.current_version()
    q2 = pipe.run_stream(f"{tmpdir_}/ckpt", max_epochs_per_trigger=3,
                         epoch_batch=4)
    q2.awaitTermination(600)
    assert pipe.table.current_version() == v
