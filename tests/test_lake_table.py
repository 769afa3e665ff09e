"""Lake table format: snapshots, schema evolution, time travel.

Mirrors the reference's DDL golden tests (DDLFactoryTest.java:66-99 — feed
DDL, assert exact schema effect) at the Iceberg-analog layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tapdata_connectors_spark.lake import LakeTable

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
          ("text", "string"), ("lang", "string")]


def make(spark, tmpdir_, n_buckets=4):
    return LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url", n_buckets=n_buckets)


def test_create_and_empty_read(spark, tmpdir_):
    t = make(spark, tmpdir_)
    assert t.exists() and t.current_version() == 0
    df = t.read()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [n for n, _ in FIELDS]


def test_write_and_read_roundtrip(spark, tmpdir_):
    t = make(spark, tmpdir_)
    src = spark.createDataFrame(
        [("u1", None, None, "hello", "en"), ("u2", None, None, "welt", "de")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_event_seq", F.lit(0).cast("long")) \
     .withColumn("_deleted", F.lit(False)) \
     .withColumn("_mb", t.bucket_expr("url"))
    entries = t.write_data_files(src, "_mb")
    assert entries and all(e["path"].startswith("data/") for e in entries)
    t.commit_files(entries)
    assert t.current_version() == 1
    got = {r["url"]: r["text"] for r in t.read().collect()}
    assert got == {"u1": "hello", "u2": "welt"}


def test_schema_evolution_add_rename_widen(spark, tmpdir_):
    t = make(spark, tmpdir_)
    src = spark.createDataFrame(
        [("u1", None, None, "x", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_event_seq", F.lit(0).cast("long")) \
     .withColumn("_deleted", F.lit(False)).withColumn("_mb", t.bucket_expr("url"))
    t.commit_files(t.write_data_files(src, "_mb"))

    t.add_column("views", "int")
    # old file reads as typed null
    assert t.read().collect()[0]["views"] is None
    assert {f.name: f.dataType.simpleString() for f in t.schema().fields}["views"] == "int"

    t.rename_column("views", "view_count")
    assert "view_count" in t.read().columns and "views" not in t.read().columns

    t.widen_column("view_count", "bigint")
    assert {f.name: f.dataType.simpleString() for f in t.schema().fields}["view_count"] == "bigint"
    assert t.read().collect()[0]["view_count"] is None

    with pytest.raises(ValueError):
        t.widen_column("view_count", "int")  # narrowing forbidden

    # rename of a populated column is metadata-only: data still readable
    t.rename_column("lang", "language")
    assert t.read().collect()[0]["language"] == "en"


def test_time_travel(spark, tmpdir_):
    t = make(spark, tmpdir_)
    v0 = t.current_version()
    t.add_column("extra", "string")
    assert "extra" in t.read().columns
    assert "extra" not in t.read(version=v0).columns


def test_ddl_idempotence_guard(spark, tmpdir_):
    t = make(spark, tmpdir_)
    t.add_column("c1", "int", epoch_key="e0:ddl5")
    v = t.current_version()
    t.add_column("c1", "int", epoch_key="e0:ddl5")  # replayed: no-op
    assert t.current_version() == v


def test_ddl_guards_engine_columns(spark, tmpdir_):
    # merge key and the LWW ordering column are engine-critical: renames
    # or drops would break bucket_expr / merge ordering / the redelivery
    # stale-guard — the table must reject them loudly (ADVICE r1)
    t = make(spark, tmpdir_)
    with pytest.raises(ValueError, match="merge key"):
        t.rename_column("url", "page_url")
    with pytest.raises(ValueError, match="merge key"):
        t.drop_column("url")
    with pytest.raises(ValueError, match="ordering column"):
        t.rename_column("warc_ts", "version_ts")
    with pytest.raises(ValueError, match="ordering column"):
        t.drop_column("warc_ts")
    # non-critical columns still evolve freely
    t.rename_column("lang", "language")
    t.drop_column("language")
    assert "language" not in [f.name for f in t.schema().fields]


# ---------------------------------------------------------------------------
# vacuum (snapshot expiry + dead-file GC)
# ---------------------------------------------------------------------------

def _commit_rows(spark, t, rows, replaced_buckets=None):
    src = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_event_seq", F.lit(0).cast("long")) \
     .withColumn("_deleted", F.lit(False)).withColumn("_mb", t.bucket_expr("url"))
    return t.commit_files(t.write_data_files(src, "_mb"),
                          replaced_buckets=replaced_buckets)


def _data_files_on_disk(t):
    import posixpath
    return set(t._io.glob_files(
        posixpath.join(t._io.join("data"), "c*", "__bucket=*", "*.parquet")))


def test_vacuum_deletes_dead_files_keeps_reads_identical(spark, tmpdir_):
    t = make(spark, tmpdir_)
    # three COW rewrites of the same key -> two fully-dead commit dirs
    for i in range(3):
        _commit_rows(spark, t, [("u1", None, None, f"v{i}", "en")],
                     replaced_buckets=set(range(4)))
    head = t.current_version()
    before = {r["url"]: r["text"] for r in t.read().collect()}
    n_disk = len(_data_files_on_disk(t))
    assert len({f["path"] for f in t.manifest().files}) < n_disk

    rep = t.vacuum(retain_last=1, min_age_sec=0)
    assert rep["deleted_files"] >= 2 and rep["retained_versions"] == [head]
    # live state unchanged; disk now holds exactly the referenced set
    assert {r["url"]: r["text"] for r in t.read().collect()} == before
    import posixpath
    left = {posixpath.join("data", *p.split("/")[-3:])
            for p in _data_files_on_disk(t)}
    assert left == {f["path"] for f in t.manifest().files}
    # expired manifests are gone: old time travel raises, head still reads
    with pytest.raises(FileNotFoundError):
        t.manifest(head - 1)
    assert t.read(version=head).count() == 1
    # second vacuum is a no-op
    rep2 = t.vacuum(retain_last=1, min_age_sec=0)
    assert rep2["deleted_files"] == 0 and rep2["deleted_manifests"] == 0


def test_vacuum_retention_window_preserves_time_travel(spark, tmpdir_):
    t = make(spark, tmpdir_)
    for i in range(3):
        _commit_rows(spark, t, [(f"u{i}", None, None, f"t{i}", "en")])
    head = t.current_version()
    t.vacuum(retain_last=2, min_age_sec=0)
    # head-1 retained and readable; nothing it references was deleted
    assert t.read(version=head - 1).count() == 2
    with pytest.raises(FileNotFoundError):
        t.manifest(head - 2)


def test_vacuum_min_age_protects_inflight_writer(spark, tmpdir_):
    t = make(spark, tmpdir_)
    _commit_rows(spark, t, [("u1", None, None, "x", "en")])
    # simulate write_data_files landed but commit_files not yet run
    src = spark.createDataFrame(
        [("u2", None, None, "pending", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_event_seq", F.lit(0).cast("long")) \
     .withColumn("_deleted", F.lit(False)).withColumn("_mb", t.bucket_expr("url"))
    pending = t.write_data_files(src, "_mb")
    rep = t.vacuum(retain_last=1, min_age_sec=3600)
    assert rep["deleted_files"] == 0 and rep["skipped_recent"] >= 1
    # the in-flight commit still completes and reads back
    t.commit_files(pending)
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2"}


def test_vacuum_retain_last_validation(spark, tmpdir_):
    t = make(spark, tmpdir_)
    with pytest.raises(ValueError):
        t.vacuum(retain_last=0)
