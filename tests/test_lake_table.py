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
