"""Two-level manifests (root + content-addressed per-bucket file lists):
commit metadata cost is O(touched buckets), untouched buckets' side files
are reused byte-identically, and vacuum GC's unreferenced side files.
(Iceberg manifest-list analog — lake/table.py _serialize_manifest.)"""

from __future__ import annotations

import datetime
import json
import os
import posixpath

from pyspark.sql import functions as F

from tapdata_connectors_spark.lake import LakeTable

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
          ("text", "string"), ("lang", "string")]
DDL = ("url string, warc_ts timestamp, html binary, text string, "
       "lang string")


def _commit(t, spark, rows, seq):
    src = spark.createDataFrame(rows, DDL) \
        .withColumn("_event_seq", F.lit(seq).cast("long")) \
        .withColumn("_deleted", F.lit(False)) \
        .withColumn("_mb", t.bucket_expr("url"))
    return t.commit_files(t.write_data_files(src, "_mb"))


def _root(t, v):
    return json.loads(t._io.read_text(
        posixpath.join(t._mdir, f"v{v}.json")))


def _row(u, day):
    return (u, datetime.datetime(2024, 1, day), None, "x", "en")


def test_untouched_buckets_reuse_side_files(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url",
                         n_buckets=8)
    # seed every bucket
    _commit(t, spark, [_row(f"u{i}", 1) for i in range(64)], seq=1)
    v1 = t.current_version()
    r1 = _root(t, v1)
    assert set(r1["files_ref"]) == {str(b) for b in range(8)}
    # append-only commit touching ONE bucket
    row = _row("w0", 2)
    src = spark.createDataFrame([row], DDL)
    b = src.select(t.bucket_expr("url").alias("b")).collect()[0]["b"]
    _commit(t, spark, [row], seq=2)
    r2 = _root(t, t.current_version())
    changed = [k for k in r2["files_ref"]
               if r2["files_ref"][k] != r1["files_ref"][k]]
    assert changed == [str(b)]
    # the reused names point at the SAME files on disk (no rewrite)
    for k in r2["files_ref"]:
        if k != str(b):
            assert r2["files_ref"][k] == r1["files_ref"][k]
    # root JSON itself stays small: no inline file entries
    assert "files" not in r2
    # reads materialize identically through the cache
    assert t.read().count() == 65


def test_vacuum_gcs_unreferenced_side_files(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url",
                         n_buckets=2)
    for s in range(5):
        _commit(t, spark, [_row(f"u{s}-{i}", 1 + s) for i in range(8)],
                seq=s)
    names_before = {n for n in t._io.list_names(t._mdir)
                    if n.startswith("b") and n.endswith(".json")}
    res = t.vacuum(retain_last=1, min_age_sec=0.0)
    assert res["deleted_files"] >= 0
    names_after = {n for n in t._io.list_names(t._mdir)
                   if n.startswith("b") and n.endswith(".json")}
    head_refs = set(_root(t, t.current_version())["files_ref"].values())
    assert names_after == head_refs  # exactly the live ones survive
    assert names_before - names_after  # something was actually GC'd
    # table still fully readable after GC
    assert t.read().count() == sum(8 for _ in range(5))


def test_time_travel_and_rollback_share_side_files(spark, tmpdir_):
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url",
                         n_buckets=2)
    _commit(t, spark, [_row("a", 1)], seq=1)
    v1 = t.current_version()
    _commit(t, spark, [_row("b", 2)], seq=2)
    assert t.read(version=v1).count() == 1 and t.read().count() == 2
    t.rollback_to(v1)
    # rollback re-pins v1's file set: identical content -> identical
    # content-addressed names, no side-file duplication
    assert (set(_root(t, t.current_version())["files_ref"].values())
            == set(_root(t, v1)["files_ref"].values()))
    assert t.read().count() == 1


def test_root_size_constant_in_untouched_buckets(spark, tmpdir_):
    """The scale property itself: root bytes grow with touched buckets
    and epoch bookkeeping, not with total file count."""
    t = LakeTable.create(spark, f"{tmpdir_}/t", FIELDS, key="url",
                         n_buckets=4)
    sizes = []
    for s in range(6):
        _commit(t, spark, [_row(f"u{s}-{i}", 1) for i in range(16)], seq=s)
        sizes.append(os.path.getsize(os.path.join(
            str(t._io.local_path(t._mdir)), f"v{t.current_version()}.json")))
    # 6x the files on disk, root within a small constant band
    assert max(sizes) - min(sizes) < 256, sizes
