"""End-to-end replay fixtures F1-F11 (FIXTURES.md §4): generated CDC event
logs replayed through the engine, final lake state asserted equal to the
independent Python oracle — the decisive correctness gate of SURVEY.md §5."""

from __future__ import annotations

import pytest

from tapdata_connectors_spark.sources.generator import (
    DdlSpec,
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay


def run(spark, tmpdir_, cfg: GeneratorConfig, n_buckets=4, **pipe_kw):
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=n_buckets, **pipe_kw)
    pipe.replay_batch()
    oracle = oracle_replay(ev.collect())
    assert_state_equal(pipe.table.read(), oracle)
    return pipe, ev


def test_f1_pure_inserts(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=400, n_urls=400, epoch_size=200,
                          p_update=0.0, p_delete=0.0)
    pipe, _ = run(spark, tmpdir_, cfg)
    assert pipe.table.read().count() > 0


def test_f2_f3_upsert_delete_reinsert(spark, tmpdir_):
    # heavy update/delete mix across epochs exercises upsert + delete + reinsert
    cfg = GeneratorConfig(n_events=1200, n_urls=120, epoch_size=300,
                          p_update=0.45, p_delete=0.2)
    run(spark, tmpdir_, cfg)


def test_f4_duplicate_deliveries(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=100, epoch_size=400, p_dup=0.15)
    run(spark, tmpdir_, cfg)


def test_f5_out_of_order_within_epoch(spark, tmpdir_):
    # staging writes shuffle row order arbitrarily; fold is order-insensitive.
    # Assert explicitly: replaying a randomly re-ordered copy of the same
    # epoch produces the identical state.
    cfg = GeneratorConfig(n_events=600, n_urls=80, epoch_size=300)
    ev = generate_events(spark, cfg)
    stage_events(ev.orderBy("url"), f"{tmpdir_}/s1")     # one clustering
    stage_events(ev.orderBy("warc_ts"), f"{tmpdir_}/s2")  # another
    p1 = CdcPipeline(spark, f"{tmpdir_}/t1", f"{tmpdir_}/s1", n_buckets=4)
    p2 = CdcPipeline(spark, f"{tmpdir_}/t2", f"{tmpdir_}/s2", n_buckets=4)
    p1.replay_batch(); p2.replay_batch()
    oracle = oracle_replay(ev.collect())
    assert_state_equal(p1.table.read(), oracle)
    assert_state_equal(p2.table.read(), oracle)


def test_f6_update_with_null_before(spark, tmpdir_):
    # generator always emits null before-images: PK resolves from the event's
    # url/after (reference DbKit.java:177-186). Covered by any passing run.
    cfg = GeneratorConfig(n_events=400, n_urls=60, epoch_size=200, p_update=0.6)
    _, ev = run(spark, tmpdir_, cfg)
    assert ev.filter("before is not null").count() == 0


def test_f7_removed_fields(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=80, epoch_size=400,
                          p_update=0.5, p_removed_lang=0.3)
    _, ev = run(spark, tmpdir_, cfg)
    assert ev.filter("removed_fields is not null").count() > 0


def test_f8_ddl_add_column_mid_stream(spark, tmpdir_):
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300,
        ddl=(DdlSpec(seq=450, kind="ADD_COLUMN", column="views", new_type="int"),),
        extras_cols=(("views", 450, "int"),),
    )
    pipe, _ = run(spark, tmpdir_, cfg)
    df = pipe.table.read()
    assert "views" in df.columns
    assert df.filter("views is not null").count() > 0


def test_f9_ddl_rename_and_widen(spark, tmpdir_):
    cfg = GeneratorConfig(
        n_events=1200, n_urls=90, epoch_size=300,
        ddl=(
            DdlSpec(seq=300, kind="ADD_COLUMN", column="views", new_type="int"),
            DdlSpec(seq=600, kind="RENAME_COLUMN", column="views", new_name="view_count"),
            DdlSpec(seq=900, kind="TYPE_WIDEN", column="view_count", new_type="bigint"),
        ),
        extras_cols=(("views", 300, "int"),),
    )
    # NOTE: after the rename the generator keeps writing extras under the key
    # "views" — but real binlogs switch to the new name. Model that:
    cfg = GeneratorConfig(
        n_events=1200, n_urls=90, epoch_size=300,
        ddl=cfg.ddl,
        extras_cols=(("views", 300, "int"), ("view_count", 600, "bigint")),
    )
    pipe, _ = run(spark, tmpdir_, cfg)
    df = pipe.table.read()
    assert "view_count" in df.columns and "views" not in df.columns
    assert {f.name: f.dataType.simpleString() for f in df.schema.fields}[
        "view_count"
    ] == "bigint"


def test_f10_hot_key_skew(spark, tmpdir_):
    # 80% of events on the hot 1% of urls: correctness must be unaffected
    cfg = GeneratorConfig(n_events=2000, n_urls=500, epoch_size=1000, p_hot=0.8)
    run(spark, tmpdir_, cfg)


def test_f11_kill_and_resume(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1000, n_urls=100, epoch_size=250)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")

    # crash after epoch 1: apply first two epochs only
    from pyspark.sql import functions as F
    from tapdata_connectors_spark.schema import EVENTS_SCHEMA
    p = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    for e in (0, 1):
        df = spark.read.schema(EVENTS_SCHEMA).parquet(f"{tmpdir_}/staging/epoch={e}")
        p.apply_epoch(df, e)
    v_mid = p.table.current_version()

    # restart: full replay must skip applied epochs and finish the rest
    p2 = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    res = p2.replay_batch()
    skipped = [r for r in res if r.get("skipped")]
    assert len(skipped) == 2  # epochs 0,1 were no-ops

    oracle = oracle_replay(ev.collect())
    assert_state_equal(p2.table.read(), oracle)

    # and a second full replay is entirely idempotent
    v_done = p2.table.current_version()
    res2 = p2.replay_batch()
    assert all(r.get("skipped") for r in res2)
    assert p2.table.current_version() == v_done
    assert v_done > v_mid


def test_policy_insert_on_nonexists(spark, tmpdir_):
    from tapdata_connectors_spark.plans.policies import WritePolicy
    cfg = GeneratorConfig(n_events=600, n_urls=80, epoch_size=300, p_update=0.6)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(
        spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4,
        policy=WritePolicy(update_policy="insert_on_nonexists"),
    )
    pipe.replay_batch()
    oracle = oracle_replay(ev.collect(), update_policy="insert_on_nonexists")
    assert_state_equal(pipe.table.read(), oracle)


def test_policy_ignore_on_exists(spark, tmpdir_):
    from tapdata_connectors_spark.plans.policies import WritePolicy
    cfg = GeneratorConfig(n_events=600, n_urls=60, epoch_size=300, p_update=0.2)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")
    pipe = CdcPipeline(
        spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4,
        policy=WritePolicy(insert_policy="ignore_on_exists"),
    )
    pipe.replay_batch()
    oracle = oracle_replay(ev.collect(), insert_policy="ignore_on_exists")
    assert_state_equal(pipe.table.read(), oracle)


def test_ddl_drop_column(spark, tmpdir_):
    # add a column, use it, then drop it mid-stream (TapDropFieldEvent)
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300,
        ddl=(
            DdlSpec(seq=200, kind="ADD_COLUMN", column="views", new_type="int"),
            DdlSpec(seq=600, kind="DROP_COLUMN", column="views"),
        ),
        extras_cols=(("views", 200, "int"),),
    )
    pipe, _ = run(spark, tmpdir_, cfg)
    assert "views" not in pipe.table.read().columns


def test_tombstone_expiry(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=600, n_urls=60, epoch_size=300, p_delete=0.3)
    pipe, ev = run(spark, tmpdir_, cfg)
    raw = pipe.table.read_raw()
    n_tombs = raw.filter("_deleted").count()
    assert n_tombs > 0
    before = pipe.table.read().count()
    pipe.table.compact(buckets=list(range(4)), expire_tombstones=True)
    assert pipe.table.read_raw().filter("_deleted").count() == 0
    assert pipe.table.read().count() == before  # visible state unchanged


def test_f13_update_of_pk(spark, tmpdir_):
    # key-changing updates apply as delete(old)+insert(new) — hudi
    # ClientPerformer.java:107-132; fold sees them pre-split
    # (operators/events.normalize_events)
    cfg = GeneratorConfig(n_events=800, n_urls=80, epoch_size=400,
                          p_update=0.5, p_key_change=0.3)
    _, ev = run(spark, tmpdir_, cfg)
    assert ev.filter("before.url is not null and before.url <> url").count() > 0


def test_f13_update_of_pk_mor(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=80, epoch_size=400,
                          p_update=0.5, p_key_change=0.3)
    run(spark, tmpdir_, cfg, merge_mode="mor")


def test_f14_null_pk_skipped_and_counted(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=80, epoch_size=400,
                          p_update=0.4, p_null_pk=0.1)
    pipe, ev = run(spark, tmpdir_, cfg)
    n_null = ev.filter(
        "url is null and after.url is null and before.url is null"
    ).count()
    assert n_null > 0
    # skipped events are accounted under lineage partition -2
    lin = pipe.lineage().filter("partition_id = -2")
    assert lin.agg({"n_events": "sum"}).collect()[0][0] == n_null


def test_f14_null_pk_mor(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=800, n_urls=80, epoch_size=400,
                          p_update=0.4, p_null_pk=0.1, p_delete=0.15)
    pipe, ev = run(spark, tmpdir_, cfg, merge_mode="mor")
    n_null = ev.filter("url is null").count()
    lin = pipe.lineage().filter("partition_id = -2")
    assert lin.agg({"n_events": "sum"}).collect()[0][0] == n_null


def test_f13_f14_combined_with_dups(spark, tmpdir_):
    cfg = GeneratorConfig(n_events=1200, n_urls=100, epoch_size=300,
                          p_update=0.5, p_delete=0.1, p_key_change=0.2,
                          p_null_pk=0.05, p_dup=0.1)
    run(spark, tmpdir_, cfg)


def test_resume_from_timestamp_api(spark, tmpdir_):
    # start_at(ts) maps a wall-clock restart point to the first epoch and
    # skips everything earlier (timestampToStreamOffset analog,
    # MysqlConnector.java:760-771)
    cfg = GeneratorConfig(n_events=1000, n_urls=100, epoch_size=250,
                          p_update=0.4, p_delete=0.1)
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmpdir_}/staging")

    # a ts inside epoch 2 (warc_ts = 1_700_000_000_000 + seq*250 ms)
    import datetime as dt
    cut = dt.datetime.utcfromtimestamp((1_700_000_000_000 + 500 * 250) / 1000)

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging", n_buckets=4)
    e0 = pipe.start_at(cut)
    assert e0 == 2
    pipe.replay_batch()

    rows = [r for r in ev.collect() if r["epoch"] >= e0]
    oracle = oracle_replay(rows)
    assert_state_equal(pipe.table.read(), oracle)

    # past-the-end timestamp: nothing to replay
    p2 = CdcPipeline(spark, f"{tmpdir_}/t2", f"{tmpdir_}/staging", n_buckets=4)
    assert p2.start_at(dt.datetime(2100, 1, 1)) is None
    assert p2.replay_batch() == []


def test_ddl_add_column_with_specs(spark, tmpdir_):
    # DEFAULT / NOT NULL / COMMENT attribute specs
    # (MysqlAddColumnDDLWrapper.java:35-98): pre-ADD rows read the initial
    # default; attributes land in the manifest schema
    cfg = GeneratorConfig(
        n_events=400, n_urls=300, epoch_size=200, p_update=0.2, p_delete=0.05,
        ddl=(DdlSpec(seq=200, kind="ADD_COLUMN", column="views",
                     new_type="int", new_default="7", not_null=False,
                     comment="page view counter"),),
        extras_cols=(("views", 200, "int"),),
    )
    pipe, _ = run(spark, tmpdir_, cfg)
    df = pipe.table.read()
    # rows never touched after the ADD carry the default, not null
    assert df.filter("views = 7").count() > 0
    f = [f for f in pipe.table.manifest().fields if f.name == "views"][0]
    assert f.default == "7" and f.comment == "page view counter"
