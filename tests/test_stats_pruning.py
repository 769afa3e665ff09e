"""Per-file column bounds in the manifest + metadata-only scan pruning
(Iceberg lowerBounds/upperBounds analog, lake/stats.py): bounds recorded
at commit, files skipped before any data IO, results identical to the
unpruned scan + filter."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tapdata_connectors_spark.lake import LakeTable
from tapdata_connectors_spark.schema import SEQ_COL
from tapdata_connectors_spark.sources.generator import (
    GeneratorConfig,
    generate_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
          ("text", "string"), ("lang", "string")]
DDL = ("url string, warc_ts timestamp, html binary, text string, "
       "lang string")


def _commit(t, spark, rows, seq):
    src = spark.createDataFrame(rows, DDL) \
        .withColumn("_event_seq", F.lit(seq).cast("long")) \
        .withColumn("_deleted", F.lit(False)) \
        .withColumn("_mb", t.bucket_expr("url"))
    t.commit_files(t.write_data_files(src, "_mb"))


def _ts(day):
    return datetime.datetime(2024, 1, day)


def test_bounds_and_rows_attached_at_commit(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url", n_buckets=2)
    _commit(t, spark, [("a", _ts(1), None, "x", "en"),
                       ("b", _ts(2), None, "y", "de")], seq=5)
    entries = t.manifest().files
    assert entries
    for e in entries:
        assert e["rows"] >= 1
        st = e["stats"]
        assert "url" in st and "_event_seq" in st and "warc_ts" in st
        assert st["_event_seq"] == [5, 5]
        # timestamps encoded as epoch micros
        assert all(isinstance(v, int) for v in st["warc_ts"])


def test_prune_entries_skips_disjoint_commits(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url", n_buckets=1)
    _commit(t, spark, [(f"a{i}", _ts(1), None, "x", "en") for i in range(8)],
            seq=10)
    # append-only second commit (bucket not replaced: union read)
    m = t.manifest()
    src = spark.createDataFrame(
        [(f"b{i}", _ts(20), None, "y", "de") for i in range(8)], DDL
    ).withColumn("_event_seq", F.lit(99).cast("long")) \
     .withColumn("_deleted", F.lit(False)) \
     .withColumn("_mb", t.bucket_expr("url"))
    t.commit_files(t.write_data_files(src, "_mb"))

    m = t.manifest()
    assert len(m.files) == 2
    kept = t.prune_entries(m, m.files, {SEQ_COL: (50, None)})
    assert len(kept) == 1 and kept[0]["stats"][SEQ_COL] == [99, 99]
    kept = t.prune_entries(m, m.files, {"warc_ts": (None, _ts(5))})
    assert len(kept) == 1 and kept[0]["stats"][SEQ_COL] == [10, 10]
    # unbounded predicate keeps everything
    assert len(t.prune_entries(m, m.files, {"url": (None, None)})) == 2
    # the prune reaches the PHYSICAL scan: only the surviving file is an
    # input of the plan, and the re-applied predicate is pushed into it
    rr = t.read_range({"warc_ts": (None, _ts(5))})
    assert len(rr.inputFiles()) == 1
    plan = rr._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "DataFilters: [isnotnull(warc_ts" in scan  # reaches the scan


def test_read_range_matches_unpruned_filter_cow_and_mor(spark, tmpdir_):
    for mode in ("cow", "mor"):
        pipe = CdcPipeline(spark, f"{tmpdir_}/{mode}/pages",
                           f"{tmpdir_}/{mode}/staging", n_buckets=4,
                           merge_mode=mode, compact_every=99)
        ev = generate_events(spark, GeneratorConfig(
            n_events=900, n_urls=120, epoch_size=300,
            p_update=0.4, p_delete=0.15))
        for e in (0, 1, 2):
            pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
        t = pipe.table
        # generator warc_ts = 1.7e12 ms + seq*250ms; pick a mid-run window
        base = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            seconds=1_700_000_000)
        lo = base + datetime.timedelta(seconds=50)
        hi = base + datetime.timedelta(seconds=150)
        want = {tuple(r) for r in t.read()
                .filter((F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi))
                .collect()}
        got = {tuple(r) for r in t.read_range({"warc_ts": (lo, hi)}).collect()}
        assert got == want, mode
        assert want  # non-vacuous


def test_mor_prune_never_resurrects_stale_versions(spark, tmpdir_):
    """Keys inserted in epoch 0 (ts inside the probe window) and updated/
    deleted in epoch 1 (ts after it): per-file pruning would drop the
    superseding epoch-1 delta and resurrect the stale epoch-0 version.
    Bucket-granular pruning must return exactly resolve-then-filter."""
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=400, n_urls=60, epoch_size=200, p_update=0.6, p_delete=0.2))
    for e in (0, 1):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    base = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=1_700_000_000)
    # window = epoch 0 only (seqs 0..199 → +0..50s)
    lo, hi = base, base + datetime.timedelta(seconds=49.75)
    want = {tuple(r) for r in t.read()
            .filter((F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi))
            .collect()}
    got = {tuple(r) for r in t.read_range({"warc_ts": (lo, hi)}).collect()}
    assert got == want
    # non-vacuous: some epoch-0 keys WERE superseded in epoch 1, so a
    # per-file prune would have returned extra stale rows
    e0 = {r["url"] for r in ev.filter("epoch = 0 and url is not null")
          .select("url").distinct().collect()}
    e1 = {r["url"] for r in ev.filter("epoch = 1 and url is not null")
          .select("url").distinct().collect()}
    assert e0 & e1


def test_lookup_matches_full_filter(spark, tmpdir_):
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=600, n_urls=80, epoch_size=300, p_delete=0.25))
    for e in (0, 1):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    live = {r["url"] for r in t.read().select("url").collect()}
    all_urls = {r["url"] for r in ev.select("url").distinct().collect()}
    dead = sorted(all_urls - live)
    u = sorted(live)[0]
    want = t.read().filter(F.col("url") == u).collect()
    got = t.lookup(u).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and len(got) == 1
    if dead:  # tombstoned key: empty, not a resurrected row
        assert t.lookup(dead[0]).count() == 0
    assert t.lookup("never-seen-url").count() == 0


def test_mor_key_prune_is_per_file_and_lookup_correct(spark, tmpdir_):
    """Merge-key predicates prune PER-FILE even inside MOR buckets
    (resolution is per-key: files provably not containing the key add
    nothing to its resolution), unlike non-key predicates which stay
    bucket-granular. Both the skip and full-fidelity resolution are
    asserted."""
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=1, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=800, n_urls=400, epoch_size=100, p_update=0.5))
    # segregate each epoch's keys into a disjoint string range so the
    # per-file key bounds are discriminating (keys stay self-consistent:
    # url column and both images get the same prefix)
    pfx = F.concat(F.lit("e"), F.col("epoch").cast("string"), F.lit("-"))
    ev = (
        ev.withColumn("url", F.when(F.col("url").isNotNull(),
                                    F.concat(pfx, F.col("url"))))
        .withColumn("after", F.col("after").withField(
            "url", F.concat(pfx, F.col("after.url"))))
        .withColumn("before", F.col("before").withField(
            "url", F.concat(pfx, F.col("before.url"))))
    )
    for e in range(8):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    m = t.manifest()
    assert any(e.get("kind") == "delta" for e in m.files)
    urls = sorted(r["url"] for r in t.read().filter(
        F.col("url").startswith("e3-")).select("url").collect())
    probe = urls[len(urls) // 2]
    kept = t.prune_entries(m, m.files, {m.key: (probe, probe)})
    # per-file even though every file sits in the one delta-bearing
    # bucket: only the files whose key range covers e3- survive, while a
    # non-key predicate keeps the whole bucket (bucket granularity)
    assert 0 < len(kept) < len(m.files)
    far = datetime.datetime(2099, 1, 1)
    assert len(t.prune_entries(
        m, m.files, {"warc_ts": (None, far)})) == len(m.files)
    want = [tuple(r) for r in t.read().filter(F.col("url") == probe).collect()]
    assert [tuple(r) for r in t.lookup(probe).collect()] == want and want


def test_compaction_clusters_by_key(spark, tmpdir_):
    """Compaction rewrites buckets key-sorted (write_data_files
    cluster_by): per-row-group key ranges become disjoint so pushed-down
    key predicates skip inside files; state is unchanged."""
    import pyarrow.parquet as pq

    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=2, merge_mode="mor", compact_every=99)
    ev = generate_events(spark, GeneratorConfig(
        n_events=600, n_urls=120, epoch_size=300, p_update=0.5))
    for e in (0, 1):
        pipe.apply_epoch(ev.filter(F.col("epoch") == e), e)
    t = pipe.table
    before = {tuple(r) for r in t.read().collect()}
    t.compact()
    after = {tuple(r) for r in t.read().collect()}
    assert after == before
    m = t.manifest()
    assert m.files and all(e.get("kind") != "delta" for e in m.files)
    for e in m.files:
        lp = t._io.local_path(t._io.join(e["path"]))
        phys = t._phys_name(m, e, m.key)
        urls = pq.read_table(lp, columns=[phys]).column(phys).to_pylist()
        assert urls == sorted(urls) and len(urls) > 1


def test_prune_follows_rename_by_field_id(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url", n_buckets=1)
    _commit(t, spark, [("a", _ts(1), None, "x", "en")], seq=1)
    t.rename_column("lang", "language")
    m = t.manifest()
    # physical name in the old file is still lang; logical is language
    kept = t.prune_entries(m, m.files, {"language": ("zz", None)})
    assert kept == []  # bounds prove no match despite the rename
    assert t.read_range({"language": (None, "zz")}).count() == 1
