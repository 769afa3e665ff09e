"""Incrementally-maintained rollups (streaming/rollup.py): the stored
aggregate equals a full recompute after every refresh — across inserts,
deletes and group-CHANGING updates — with exactly-once refresh guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from tapdata_connectors_spark.sources.generator import (
    GeneratorConfig,
    generate_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tapdata_connectors_spark.streaming.rollup import (
    create_rollup_table,
    refresh_rollup,
    rollup_watermark,
)


def _expected(t, group_col="lang"):
    rows = (
        t.read()
        .groupBy(F.coalesce(F.col(group_col).cast("string"),
                            F.lit("__null__")).alias("g"))
        .count()
        .collect()
    )
    return {r["g"]: r["count"] for r in rows}


def _stored(dst):
    return {r[0]: r["n"] for r in dst.read().collect()}


def test_rollup_tracks_full_recompute_incrementally(spark, tmpdir_):
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="cow")
    ev = generate_events(spark, GeneratorConfig(
        n_events=1200, n_urls=150, epoch_size=300,
        p_update=0.45, p_delete=0.2))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup", ("lang", "string"))

    versions = [0]  # table is created by the first apply; v0 = empty
    for e in range(4):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
        res = refresh_rollup(pipe.table, dst, "lang")
        assert not res["skipped"]
        assert _stored(dst) == _expected(pipe.table), f"epoch {e}"
        versions.append(pipe.table.current_version())
    assert rollup_watermark(dst) == pipe.table.current_version()
    # updates in the generator rewrite lang -> the equality above only
    # bites if group-changing updates happened inside the refresh
    # windows the rollup actually consumed; prove they did
    moved = 0
    for lo, hi in zip(versions, versions[1:]):
        ch = pipe.table.read_changes(lo, hi, preimages=True)
        pre = ch.filter("_change_type = 'update_preimage'") \
            .select("url", F.col("lang").alias("old"))
        post = ch.filter("_change_type = 'update_postimage'") \
            .select("url", F.col("lang").alias("new"))
        moved += pre.join(post, "url") \
            .filter("old IS DISTINCT FROM new").count()
    assert moved > 0


def test_rollup_with_sums_across_ddl(spark, tmpdir_):
    """sum_cols maintains per-group SUMS with the same signed algebra;
    the summed column arrives MID-STREAM via ADD COLUMN DDL, so the
    rollup also proves itself across schema evolution (rows from before
    the DDL sum the column as 0/null)."""
    from tapdata_connectors_spark.sources.generator import DdlSpec

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="cow")
    ev = generate_events(spark, GeneratorConfig(
        n_events=900, n_urls=120, epoch_size=300,
        p_update=0.45, p_delete=0.15,
        ddl=(DdlSpec(seq=300, kind="ADD_COLUMN", column="views",
                     new_type="int"),),
        extras_cols=(("views", 300, "int"),),
    ))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup",
                              ("lang", "string"), sum_cols=["views"])
    for e in range(3):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
        res = refresh_rollup(pipe.table, dst, "lang", sum_cols=["views"])
        assert not res["skipped"]
        want = {
            r["g"]: (r["n"], r["sv"])
            for r in pipe.table.read().groupBy(
                F.coalesce(F.col("lang").cast("string"),
                           F.lit("__null__")).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.coalesce(F.col("views").cast("bigint"),
                                  F.lit(0))).alias("sv"))
            .collect()
        } if "views" in pipe.table.read().columns else {
            r["g"]: (r["n"], 0)
            for r in pipe.table.read().groupBy(
                F.coalesce(F.col("lang").cast("string"),
                           F.lit("__null__")).alias("g"))
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        got = {r["lang"]: (r["n"], r["sum_views"]) for r in dst.read().collect()}
        assert got == want, f"epoch {e}"
    # the summed column really carried values by the end
    assert any(sv != 0 for _, sv in got.values())


def test_rollup_min_max_with_retracted_extremes(spark, tmpdir_):
    """min/max rollup columns: inserts fold algebraically; deletes and
    updates that retract a group's current extreme trigger the
    affected-group recompute fallback — stored state equals a full
    recompute after EVERY refresh, across heavy churn, and at least one
    refresh actually exercised the recompute path."""
    from tapdata_connectors_spark.sources.generator import DdlSpec

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="cow")
    ev = generate_events(spark, GeneratorConfig(
        n_events=900, n_urls=100, epoch_size=300,
        p_update=0.45, p_delete=0.25,
        ddl=(DdlSpec(seq=1, kind="ADD_COLUMN", column="views",
                     new_type="int"),),
        extras_cols=(("views", 1, "int"),),
    ))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup", ("lang", "string"),
                              min_cols=["views"], max_cols=["views"])
    recomputed_total = 0
    for e in range(3):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
        res = refresh_rollup(pipe.table, dst, "lang",
                             min_cols=["views"], max_cols=["views"])
        assert not res["skipped"]
        recomputed_total += res["recomputed_groups"]
        t = pipe.table.read()
        want = {
            r["g"]: (r["n"], r["mn"], r["mx"])
            for r in t.groupBy(
                F.coalesce(F.col("lang").cast("string"),
                           F.lit("__null__")).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(F.col("views").cast("bigint")).alias("mn"),
                 F.max(F.col("views").cast("bigint")).alias("mx"))
            .collect()
        }
        got = {r["lang"]: (r["n"], r["min_views"], r["max_views"])
               for r in dst.read().collect()}
        assert got == want, f"epoch {e}"
    # the fallback really ran: with 25% deletes + 45% updates over 3
    # epochs some group's extreme was retracted
    assert recomputed_total > 0


def test_rollup_min_insert_only_skips_recompute(spark, tmpdir_):
    """The common refresh — inserts only, nothing retracted — must never
    touch the source: recomputed_groups == 0 (the O(delta + |groups|)
    fast path), while a subsequent delete OF the minimum forces exactly
    that group through the fallback."""
    import datetime

    from tapdata_connectors_spark.sources.generator import DdlSpec

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="cow")
    ev = generate_events(spark, GeneratorConfig(
        n_events=200, n_urls=60, epoch_size=200, p_update=0.0, p_delete=0.0,
        ddl=(DdlSpec(seq=1, kind="ADD_COLUMN", column="views",
                     new_type="int"),),
        extras_cols=(("views", 1, "int"),),
    ))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup", ("lang", "string"),
                              min_cols=["views"])
    pipe.apply_epoch(ev.filter(F.col("epoch") == 0), 0)
    res = refresh_rollup(pipe.table, dst, "lang", min_cols=["views"])
    assert res["recomputed_groups"] == 0
    # delete the row holding some group's minimum
    t = pipe.table.read()
    victim = (
        t.filter(F.col("views").isNotNull())
        .orderBy(F.col("views").cast("bigint").asc(), F.col("url").asc())
        .select("url", "lang").limit(1).collect()[0]
    )
    del_ev = spark.createDataFrame(
        [(500, 1, "D", victim["url"],
          datetime.datetime(2024, 6, 1), None, None, None, None, None,
          None, 1_720_000_000_000)], ev.schema)
    pipe.apply_epoch(del_ev, 1)
    res2 = refresh_rollup(pipe.table, dst, "lang", min_cols=["views"])
    assert res2["recomputed_groups"] >= 1
    want = {
        r["g"]: (r["n"], r["mn"])
        for r in pipe.table.read().groupBy(
            F.coalesce(F.col("lang").cast("string"),
                       F.lit("__null__")).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(F.col("views").cast("bigint")).alias("mn")).collect()
    }
    got = {r["lang"]: (r["n"], r["min_views"]) for r in dst.read().collect()}
    assert got == want


def test_rollup_refresh_idempotent_and_skips_when_current(spark, tmpdir_):
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=600, n_urls=80, epoch_size=300, p_delete=0.25))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup", ("lang", "string"))
    for e in (0, 1):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    res1 = refresh_rollup(pipe.table, dst, "lang")
    assert not res1["skipped"]
    before = _stored(dst)
    v = dst.current_version()
    # nothing new at the source -> skipped, no commit
    res2 = refresh_rollup(pipe.table, dst, "lang")
    assert res2["skipped"] and dst.current_version() == v
    # explicit redelivery of the same (since, to) window -> guard skips
    res3 = refresh_rollup(pipe.table, dst, "lang",
                          to_version=pipe.table.current_version())
    assert res3["skipped"] and _stored(dst) == before
    assert _stored(dst) == _expected(pipe.table)


def test_rollup_groups_vanish_at_zero(spark, tmpdir_):
    """Delete every row of a group -> the group row leaves the rollup
    (tombstoned), never lingering as a zero-count row."""
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="cow")
    ev = generate_events(spark, GeneratorConfig(
        n_events=400, n_urls=60, epoch_size=200, p_delete=0.0))
    dst = create_rollup_table(spark, f"{tmpdir_}/rollup", ("lang", "string"))
    pipe.apply_epoch(ev.filter(F.col("epoch") == 0), 0)
    refresh_rollup(pipe.table, dst, "lang")
    langs = sorted(_stored(dst))
    assert langs
    # delete every live page via the engine's own delete path: replay the
    # current keys as delete events with later seq/ts
    live = pipe.table.read().select("url").collect()
    n0 = len(live)
    del_events = (
        ev.filter(F.col("epoch") == 0).limit(0)  # schema template
    )
    import datetime
    rows = []
    for i, r in enumerate(live):
        rows.append((400 + i, 1, "D", r["url"],
                     datetime.datetime(2024, 6, 1, 0, 0, i % 60),
                     None, None, None, None, None, None,
                     1_720_000_000_000 + i))
    del_events = spark.createDataFrame(rows, ev.schema)
    pipe.apply_epoch(del_events, 1)
    assert pipe.table.read().count() == 0
    refresh_rollup(pipe.table, dst, "lang")
    assert _stored(dst) == {}
    assert dst.read().count() == 0 and n0 > 0
