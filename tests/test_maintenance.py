"""Table maintenance ops: rebucket (partition-spec evolution) and
expire_epochs (exactly-once guard retention)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tapdata_connectors_spark.sources.generator import (
    GeneratorConfig,
    generate_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay


def _pipe(spark, tmpdir_, n_events=900, mode="mor", n_buckets=4):
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=n_buckets, merge_mode=mode, compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=n_events, n_urls=n_events // 6, epoch_size=300,
        p_update=0.4, p_delete=0.15))
    for e in range(n_events // 300):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    return pipe, ev


def test_rebucket_preserves_state_and_serves_reads(spark, tmpdir_):
    pipe, ev = _pipe(spark, tmpdir_, mode="mor", n_buckets=4)
    t = pipe.table
    assert any(e.get("kind") == "delta" for e in t.manifest().files)
    before_raw = {tuple(r) for r in t.read_raw().collect()}  # incl tombstones
    t.rebucket(16)
    m = t.manifest()
    assert m.n_buckets == 16
    assert all(e.get("kind") != "delta" for e in m.files)  # resolved rewrite
    assert {tuple(r) for r in t.read_raw().collect()} == before_raw
    assert_state_equal(t.read(), oracle_replay(ev.collect()))
    # lookup runs through the NEW bucket function
    u = t.read().select("url").orderBy("url").limit(1).collect()[0]["url"]
    want = [tuple(r) for r in t.read().filter(F.col("url") == u).collect()]
    assert [tuple(r) for r in t.lookup(u).collect()] == want
    # tombstones (redelivery guards) survived the rewrite
    assert t.read_raw().filter("_deleted").count() > 0


def test_rebucket_noop_and_later_epochs_use_new_modulus(spark, tmpdir_):
    pipe, ev = _pipe(spark, tmpdir_, n_events=600, mode="cow", n_buckets=2)
    t = pipe.table
    v = t.rebucket(2)  # same count: no-op, no new snapshot
    assert v == t.current_version()
    t.rebucket(8)
    # the pipeline keeps working after the spec change: apply another epoch
    more = generate_events(spark, GeneratorConfig(
        n_events=900, n_urls=100, epoch_size=300, p_update=0.4,
        p_delete=0.15))
    pipe.apply_epoch(more.filter(F.col("epoch") == 2), 2)
    replayed = ev.filter(F.col("epoch") < 2).unionByName(
        more.filter(F.col("epoch") == 2))
    assert_state_equal(t.read(), oracle_replay(replayed.collect()))
    assert {e["bucket"] for e in t.manifest().files} <= set(range(8))


def test_expire_epochs_readmits_and_cow_merge_stays_idempotent(spark, tmpdir_):
    """COW target: expiring a guard entry re-admits the epoch, and an
    actual redelivery is absorbed by the MERGE stale guard (state
    unchanged) — the double safety the docstring describes. (MOR targets
    must expire strictly behind the redelivery horizon instead; the
    docstring carries the contract.)"""
    pipe, ev = _pipe(spark, tmpdir_, n_events=600, mode="cow")
    t = pipe.table
    applied = list(t.manifest().applied_epochs)
    assert applied
    victim = applied[0]
    res = t.expire_epochs(lambda k: k != victim)
    assert res["dropped"] == 1 and not t.epoch_applied(victim)
    if len(applied) > 1:
        assert t.epoch_applied(applied[1])
    before = {tuple(r) for r in t.read().collect()}
    pipe.apply_epoch(ev.filter(F.col("epoch") == 0), 0)
    assert {tuple(r) for r in t.read().collect()} == before
    # nothing to drop -> no new snapshot
    v = t.current_version()
    assert t.expire_epochs(lambda k: True) == {"dropped": 0, "version": v}
